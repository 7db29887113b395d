"""Multi-action table transactions: several DML / property updates in
ONE atomic commit.

Reference parity: ``transaction.h:31-51`` declares
``Transaction::table() / NewAppend() / CommitTransaction()`` but the
reference never implements it (``type_fwd.h:153-157``: AppendFiles is
declared absent). This module delivers the semantics Spark-side and
goes past the declared surface: any number of appends, CoW/MoR
deletes, merges, overwrites and property changes accumulate on a
PRIVATE working copy of the table — each action becomes one snapshot
in a pending chain, its data and manifest files written eagerly
(invisible until the metadata pointer moves) — then ``commit()``
publishes the whole chain with ONE metadata-pointer CAS. Readers see
all of it or none of it; ``transaction.h``'s NewAppend+CommitTransaction
pair maps to ``txn.append(df)`` + ``txn.commit()``.

Conflict handling (CommitFailedException parity): the final CAS
asserts the branch head is still the snapshot the transaction started
from. When a concurrent writer moved it, the batch is REBASED — one
``_validate_rebase`` pass checks the union of the transaction's
rewritten/required paths against the fresh head (the single-commit
conflict rules applied across the batch; the transaction's own added
files are excluded since the rebuilt chain re-adds them), then the
snapshot chain is rebuilt against the new base with every DATA FILE
REUSED (only manifests rewrite) and the CAS retries.
``commit.retry.*`` table properties bound the attempts.

Scale shape: action-time work (data-file writes, rewrite planning) is
all distributed Spark jobs — the transaction only defers the
metadata-pointer move, which is O(1). A rebase replays manifest
authoring only; no data moves twice.
"""

from __future__ import annotations

import copy
import os
import time as _time
from typing import Optional

MAIN_BRANCH = "main"


class Transaction:
    """Accumulates table updates on a working copy; ``commit()``
    publishes them atomically. Single-branch by design — the one CAS
    asserts one ref. Use through ``IceTable.new_transaction()``."""

    def __init__(self, table, branch: str = MAIN_BRANCH):
        if getattr(table, "_txn", None) is not None:
            raise ValueError("table handle is already inside a transaction")
        self.branch = branch
        self.base = table
        self._closed = False
        self._recording = False
        # ordered action log for conflict rebase:
        # ("files", _commit_files_once params) | ("props", (updates, removals))
        self._log: list[tuple] = []
        ref = table.metadata.ref(branch)
        self._base_sid: Optional[int] = (
            ref.snapshot_id if ref else table.metadata.current_snapshot_id)
        # metadata pointer the pending chain is built on — the no-op
        # rebase check compares it, not just the branch head (a
        # concurrent properties-only commit moves the pointer without
        # moving the head and still needs a replay)
        self._base_loc = table.metadata_location
        self.working = copy.copy(table)
        self.working._txn = self

    # -- reference Transaction::table() ---------------------------------
    def table(self):
        """The transaction's working view of the table: scans here see
        the pending (uncommitted) chain — ``transaction.h:37`` parity."""
        return self.working

    # -- actions ----------------------------------------------------------
    def _check_open(self) -> None:
        if self._closed:
            raise ValueError("transaction already committed or abandoned")

    def append(self, df, **kw) -> "Transaction":
        self._check_open()
        self.working.append(df, branch=self.branch, **kw)
        return self

    def overwrite(self, df) -> "Transaction":
        self._check_open()
        self.working.overwrite(df, branch=self.branch)
        return self

    def overwrite_partitions(self, df) -> "Transaction":
        self._check_open()
        self.working.overwrite_partitions(df, branch=self.branch)
        return self

    def delete_where(self, expr, **kw) -> "Transaction":
        self._check_open()
        self.working.delete_where(expr, branch=self.branch, **kw)
        return self

    def merge_into(self, source, on=None, **kw) -> "Transaction":
        self._check_open()
        self.working.merge_into(source, on, branch=self.branch, **kw)
        return self

    def apply_changes(self, changes, on, **kw) -> "Transaction":
        self._check_open()
        self.working.apply_changes(changes, on, branch=self.branch, **kw)
        return self

    def add_files(self, paths, **kw) -> "Transaction":
        self._check_open()
        self.working.add_files(paths, branch=self.branch, **kw)
        return self

    def commit_files_df(self, files_df, **kw) -> "Transaction":
        self._check_open()
        self.working.commit_files_df(files_df, branch=self.branch, **kw)
        return self

    def update_where(self, expr, assignments: dict, **kw) -> "Transaction":
        self._check_open()
        self.working.update_where(expr, assignments, branch=self.branch,
                                  **kw)
        return self

    def delete_by_keys(self, keys) -> "Transaction":
        self._check_open()
        self.working.delete_by_keys(keys, branch=self.branch)
        return self

    def rewrite_data_files(self, **kw) -> "Transaction":
        """Compaction joins the pending chain. REPLACE semantics apply
        batch-wide on a conflict rebase: any concurrent commit raises
        ValidationError (the compacted output may not reflect it)."""
        self._check_open()
        self.working.rewrite_data_files(branch=self.branch, **kw)
        return self

    def rewrite_position_deletes(self) -> "Transaction":
        self._check_open()
        self.working.rewrite_position_deletes(branch=self.branch)
        return self

    def rewrite_equality_deletes(self) -> "Transaction":
        self._check_open()
        self.working.rewrite_equality_deletes(branch=self.branch)
        return self

    def update_properties(self, updates: Optional[dict] = None,
                          removals: Optional[list] = None) -> "Transaction":
        self._check_open()
        self.working.update_properties(updates, removals)
        return self

    # -- hook targets (called by IceTable in txn mode) --------------------
    def _record_props(self, table, updates, removals):
        self._check_open()
        self._log.append(("props", (dict(updates or {}),
                                    list(removals or []))))
        self._recording = True
        try:
            return table.update_properties(updates, removals)
        finally:
            self._recording = False

    def _record_file_op(self, table, params: dict):
        self._check_open()
        if params["branch"] != self.branch:
            raise ValueError(
                f"transaction is bound to branch {self.branch!r}; "
                f"got an operation on {params['branch']!r}")
        self._log.append(("files", params))
        self._recording = True
        try:
            return table._commit_files_once(**params)
        finally:
            self._recording = False

    # -- publish ----------------------------------------------------------
    def commit(self):
        """Publish the accumulated chain with one CAS; rebase + retry
        on conflict (``commit.retry.*``). Returns the committed
        IceTable handle. No-op transactions return the base table."""
        self._check_open()
        from iceberg_cpp_spark.sources.catalog import CommitFailedError

        if not self._log:
            self._closed = True
            self.working._txn = None
            return self.base
        retries = int(self.base.properties().get(
            "commit.retry.num-retries", "4"))
        backoff_ms = int(self.base.properties().get(
            "commit.retry.min-wait-ms", "100"))
        last: Exception = None
        for attempt in range(retries + 1):
            try:
                out = self._publish()
                self._closed = True
                self.working._txn = None
                return out
            except (CommitFailedError, FileExistsError) as e:
                last = e
                if attempt == retries:
                    break
                _time.sleep(min(backoff_ms * (2 ** attempt), 60_000) / 1000.0)
                self._rebase()
        raise last

    def _publish(self):
        from iceberg_cpp_spark.core.metadata import write_table_metadata
        from iceberg_cpp_spark.sources.catalog import AssertRefSnapshotId

        new_meta = self.working.metadata
        t = self.base
        if t.catalog is not None:
            reqs = [AssertRefSnapshotId(self.branch, self._base_sid)]
            loc = t.catalog.commit_table(t.identifier, reqs, new_meta)
        else:
            # filesystem CAS: exclusive-create of the next version file —
            # a concurrent commit took it first → FileExistsError → rebase
            base_name = os.path.basename(t.metadata_location)
            version = (int(base_name.split(".")[0][1:])
                       if base_name.startswith("v") else 0)
            loc = os.path.join(new_meta.location, "metadata",
                               f"v{version + 1}.metadata.json")
            write_table_metadata(new_meta, loc, exclusive=True)
        t.metadata = new_meta
        t.metadata_location = loc
        return t

    def _rebase(self):
        """Concurrent commit won the CAS: validate the batch against
        the fresh head, then rebuild the snapshot chain on top of it
        (data files reused; manifests re-authored). A branch head that
        did NOT move is a no-op: the pending chain already sits on it,
        so the working copy (and every authored manifest) is kept as-is
        — a multi-table conflict on a sibling table must not re-author
        an untouched table's chain (VERDICT r15 item 7)."""
        fresh = self.base.refresh()
        ref = fresh.metadata.ref(self.branch)
        head_sid = (ref.snapshot_id if ref
                    else fresh.metadata.current_snapshot_id)
        if (head_sid == self._base_sid
                and fresh.metadata_location == self._base_loc):
            return
        file_ops = [p for kind, p in self._log if kind == "files"]
        txn_added = {f.file_path for p in file_ops for f in p["new_files"]}
        candidates = set().union(
            *(p.get("drop_paths") or set() for p in file_ops),
            *(p.get("drop_dv_for") or set() for p in file_ops),
            *(p.get("require_live") or set() for p in file_ops))
        # commit_files_df ops register files only as prebuilt manifest
        # pointers (new_files=[]): a later op in the SAME txn that
        # rewrites those files must not demand them live on the fresh
        # head (the replay re-adds them). Resolve only the candidate
        # paths — bounded by the later ops' matched files, never the
        # bulk registration size.
        txn_added |= self._prebuilt_added(file_ops, candidates - txn_added)
        drop_paths = set().union(*(p.get("drop_paths") or set()
                                   for p in file_ops)) - txn_added
        drop_dv_for = set().union(*(p.get("drop_dv_for") or set()
                                    for p in file_ops)) - txn_added
        require_live = set().union(*(p.get("require_live") or set()
                                     for p in file_ops)) - txn_added
        carry = all(p.get("carry_existing", True) for p in file_ops)
        parent = (fresh.metadata.snapshot_by_id(head_sid)
                  if head_sid is not None else None)
        if parent is not None and head_sid != self._base_sid:
            # batch-level snapshot-isolation check: every path any op
            # rewrites must still be live on the fresh head, no newer
            # delete may target them, and a whole-content replace
            # conflicts with ANY concurrent commit (ValidationError)
            fresh._validate_rebase(
                parent, self._base_sid if self._base_sid is not None else -1,
                drop_paths or None, drop_dv_for or None, carry,
                "transaction", require_live=require_live or None)
        self._base_sid = head_sid
        self._base_loc = fresh.metadata_location
        self.working = copy.copy(fresh)
        self.working._txn = self
        self._recording = True
        try:
            for kind, p in self._log:
                if kind == "files":
                    q = dict(p)
                    # per-op read-snapshot validation is superseded by
                    # the batch validation above (the original read ids
                    # don't exist in the rebuilt chain)
                    q["read_snapshot_id"] = None
                    self.working._commit_files_once(**q)
                else:
                    updates, removals = p
                    self.working.update_properties(updates, removals)
        finally:
            self._recording = False

    def _prebuilt_added(self, file_ops: list, candidates: set) -> set:
        """Which of ``candidates`` (paths a later op in this txn
        rewrites/requires) were registered by this txn's
        ``commit_files_df`` prebuilt manifest shards. Conflict-rebase
        path only; the shard manifests are filtered executor-side (a
        semi-join against the candidate set), so driver memory is
        bounded by |candidates|, not the bulk-registration size."""
        if not candidates:
            return set()
        shard_mfs = [m for p in file_ops
                     for m in (p.get("prebuilt_data_manifests") or [])]
        if not shard_mfs:
            return set()
        hits: set = set()
        pq = [m.manifest_path for m in shard_mfs
              if m.manifest_path.endswith(".parquet")]
        others = [m for m in shard_mfs
                  if not m.manifest_path.endswith(".parquet")]
        if pq:
            from pyspark.sql import functions as F

            spark = self.base.spark
            cand_df = spark.createDataFrame(
                [(c,) for c in sorted(candidates)], "p string")
            rows = (spark.read.option("mergeSchema", "true").parquet(*pq)
                    .select("file_path")
                    .join(F.broadcast(cand_df),
                          F.col("file_path") == F.col("p"), "left_semi")
                    .distinct().collect())
            hits.update(r["file_path"] for r in rows)
        if others:
            from iceberg_cpp_spark.core import manifests as mfx

            spec, schema = self.base.spec(), self.base.schema()
            for m in others:
                for e in mfx.read_manifest(m.manifest_path, spec, schema,
                                           manifest=m):
                    if e.data_file.file_path in candidates:
                        hits.add(e.data_file.file_path)
        return hits


class MultiTableTransaction:
    """Atomic writes across SEVERAL tables of one catalog — the REST
    catalog's CommitTransaction surface (the only Iceberg catalog kind
    that supports multi-table atomicity; the reference declares no
    transaction implementation at all, transaction.h:31-51).

    Each participating table gets an ordinary single-table
    :class:`Transaction` working copy, so every mutator (append,
    delete_where, merge_into, commit_files_df, ...) composes exactly as
    it does in a one-table transaction and all data-plane work runs as
    normal distributed jobs. ``commit()`` gathers every table's pending
    chain and publishes them through ONE server-side commit — all
    tables move or none do (a consistent cut across e.g. a fact table
    and its dimension).

    Conflict handling: the server validates every table's branch-head
    requirement under one lock; a concurrent writer on ANY table fails
    the whole batch with CommitFailedError, each participating
    transaction rebases onto its fresh head (single-table rebase rules
    per table), and the batch retries under ``commit.retry.*``.

    Scale shape: like the single-table transaction, only the O(#tables)
    metadata-pointer move is deferred; nothing data-plane serializes on
    the commit."""

    def __init__(self, catalog):
        if not hasattr(catalog, "commit_transaction"):
            raise ValueError(
                "catalog does not support atomic multi-table commits "
                "(the REST CommitTransaction route); use a RestCatalog, "
                "or single-table new_transaction()")
        self.catalog = catalog
        self._txns: dict[str, Transaction] = {}
        self._closed = False

    def transaction(self, ident: str, spark=None,
                    branch: str = MAIN_BRANCH) -> Transaction:
        """The (lazily created) single-table transaction for ``ident``;
        repeated calls return the same handle, so several statements
        compose on one working copy per table."""
        if self._closed:
            raise ValueError("multi-table transaction already "
                             "committed or abandoned")
        if ident not in self._txns:
            t = self.catalog.load_table(ident, spark=spark)
            txn = t.new_transaction(branch=branch)
            self._txns[ident] = txn
        return self._txns[ident]

    def table(self, ident: str, spark=None):
        """The pending working view of ``ident`` (scans see the
        uncommitted chain), creating its transaction on first use."""
        return self.transaction(ident, spark=spark).table()

    def commit(self):
        """Publish every participating table's chain in ONE atomic
        catalog commit; rebase all + retry on conflict. No-op tables
        are skipped; an all-no-op batch commits nothing."""
        if self._closed:
            raise ValueError("multi-table transaction already "
                             "committed or abandoned")
        from iceberg_cpp_spark.sources.catalog import (
            AssertRefSnapshotId, CommitFailedError)

        active = {i: x for i, x in self._txns.items() if x._log}
        if not active:
            self._finish()
            return [x.base for x in self._txns.values()]
        retries = max(int(x.base.properties().get(
            "commit.retry.num-retries", "4")) for x in active.values())
        backoff_ms = min(int(x.base.properties().get(
            "commit.retry.min-wait-ms", "100")) for x in active.values())
        last: Exception = None
        for attempt in range(retries + 1):
            changes = [
                (ident,
                 [AssertRefSnapshotId(x.branch, x._base_sid)],
                 x.working.metadata)
                for ident, x in active.items()]
            try:
                self.catalog.commit_transaction(changes)
                out = []
                for ident, x in self._txns.items():
                    if ident in active:
                        meta, loc = self.catalog.load_metadata(ident)
                        x.base.metadata = meta
                        x.base.metadata_location = loc
                    out.append(x.base)
                self._finish()
                return out
            except CommitFailedError as e:
                last = e
                if attempt == retries:
                    break
                _time.sleep(min(backoff_ms * (2 ** attempt),
                                60_000) / 1000.0)
                for x in active.values():
                    x._rebase()
        raise last

    def _finish(self) -> None:
        self._closed = True
        for x in self._txns.values():
            x._closed = True
            x.working._txn = None
