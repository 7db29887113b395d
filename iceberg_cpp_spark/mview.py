"""Materialized views: a spec view plus an Iceberg storage table with
snapshot-based freshness tracking.

Follows the Iceberg materialized-view design direction (a VIEW whose
metadata points at a STORAGE TABLE and records, per source table, the
snapshot id the materialization was computed from): readers get
warehouse-speed scans of the storage table; ``refresh()`` recomputes
only when some source moved past its recorded snapshot — a no-op
refresh costs one metadata comparison, no jobs.

The refresh is a FULL recomputation committed as one ``overwrite``
snapshot of the storage table (simple, always correct for any SQL);
incremental maintenance for restricted shapes can layer on the CDC
changelog later. Staleness state lives in the view's properties
(``materialization.table``, ``refresh.<name>.snapshot-id``) so any
engine reading the view metadata can see how fresh the data is.
"""

from __future__ import annotations

import os
from typing import Optional

from iceberg_cpp_spark.core.types import Schema, schema_from_spark
from iceberg_cpp_spark.table import IceTable
from iceberg_cpp_spark.views import IceView

MATERIALIZATION_TABLE = "materialization.table"
_REFRESH_PREFIX = "refresh."


class IceMaterializedView:
    """Handle pairing the view metadata with its storage table."""

    def __init__(self, spark, view: IceView, sources: dict[str, IceTable]):
        self.spark = spark
        self.view = view
        self.sources = dict(sources)

    # -- lifecycle ----------------------------------------------------------
    @classmethod
    def create(cls, spark, location: str, sql: str,
               sources: dict[str, "IceTable"], dialect: str = "spark",
               properties: Optional[dict] = None) -> "IceMaterializedView":
        """Create the view + storage table and run the first refresh.
        ``sources``: name → IceTable for every table the SQL references;
        they register as temp views under those names (the same
        resolution contract as plain spec views)."""
        for name, t in sources.items():
            t.create_or_replace_view(name)
        result = spark.sql(sql)
        schema = schema_from_spark(result.schema)
        storage_loc = os.path.join(location, "storage")
        props = dict(properties or {})
        props[MATERIALIZATION_TABLE] = storage_loc
        view = IceView.create(location, sql, schema, dialect=dialect,
                              properties=props)
        storage = IceTable.create(spark, storage_loc, schema)
        mv = cls(spark, view, sources)
        mv.storage = storage
        return mv.refresh()

    @classmethod
    def load(cls, spark, location: str,
             sources: dict[str, "IceTable"]) -> "IceMaterializedView":
        view = IceView.load(location)
        if MATERIALIZATION_TABLE not in view.metadata.properties:
            raise ValueError(f"not a materialized view: {location}")
        mv = cls(spark, view, sources)
        mv.storage = IceTable.load(
            spark, view.metadata.properties[MATERIALIZATION_TABLE])
        return mv

    # -- freshness ----------------------------------------------------------
    def _source_state(self) -> dict[str, str]:
        out = {}
        for name, t in sorted(self.sources.items()):
            t.refresh()
            snap = t.current_snapshot()
            out[name] = str(snap.snapshot_id if snap else 0)
        return out

    def is_fresh(self) -> bool:
        props = self.view.metadata.properties
        return all(
            props.get(f"{_REFRESH_PREFIX}{name}.snapshot-id") == sid
            for name, sid in self._source_state().items())

    def refresh(self, force: bool = False) -> "IceMaterializedView":
        """Recompute the storage table when any source moved past its
        recorded snapshot (or ``force``); otherwise a metadata-only
        no-op. One overwrite snapshot per actual refresh."""
        state = self._source_state()
        if not force and self.is_fresh():
            return self
        for name, t in self.sources.items():
            t.create_or_replace_view(name)
        result = self.spark.sql(self.view.sql_for("spark"))
        self.storage = self.storage.overwrite(result)
        self.view = self.view.update_properties({
            f"{_REFRESH_PREFIX}{name}.snapshot-id": sid
            for name, sid in state.items()})
        return self

    # -- reads ----------------------------------------------------------
    def to_df(self, allow_stale: bool = True):
        """The materialized result (storage-table scan — warehouse
        speed). ``allow_stale=False`` refreshes first when a source
        moved."""
        if not allow_stale and not self.is_fresh():
            self.refresh()
        return self.storage.to_df()
