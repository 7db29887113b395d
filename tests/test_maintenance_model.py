"""Randomized maintenance-invariance sweep: interleave DML (insert /
CoW delete / MoR delete) with file-scoped compaction
(rewrite_data_files(where=...)) and zero-copy clones on a partitioned
table, holding two invariants a single-case test can't pin under
composition: maintenance NEVER changes table content (compaction is
row-preserving with deletes folded), and a clone equals its source at
clone time then stays frozen while the source keeps mutating."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.core.metadata import (PartitionField,
                                             PartitionSpec)
from iceberg_cpp_spark.functions.transforms import from_string
from iceberg_cpp_spark.plans import expressions as ex
from iceberg_cpp_spark.sources.catalog import FileSystemCatalog


def _schema():
    return it.Schema([
        it.NestedField(1, "id", it.LongType(), True),
        it.NestedField(2, "grp", it.StringType()),
    ])


def _state(t) -> dict:
    return {r["id"]: r["grp"] for r in t.to_df().collect()}


@pytest.mark.parametrize("seed", [7, 51])
def test_random_dml_maintenance_clone_interleaving(spark, tmp_loc,
                                                   seed):
    cat = FileSystemCatalog(f"{tmp_loc}/wh_{seed}")
    cat.create_namespace("db")
    spec = PartitionSpec([PartitionField(
        source_id=2, field_id=1000, name="grp",
        transform=from_string("identity"))])
    cat.create_table("db.m", _schema(), spec=spec)
    t = cat.load_table("db.m", spark=spark)
    rng = random.Random(seed)
    grps = ["a", "b", "c"]
    model: dict = {}
    next_id = [0]
    clones: list[tuple[str, dict]] = []
    for step in range(12):
        kind = rng.choice(["insert", "insert", "delete_cow",
                           "delete_mor", "compact_where", "clone"])
        if kind == "insert":
            rows = [(next_id[0] + i, rng.choice(grps))
                    for i in range(rng.randint(1, 5))]
            next_id[0] += len(rows)
            t.append(spark.createDataFrame(rows, "id long, grp string"))
            model.update(dict(rows))
        elif kind in ("delete_cow", "delete_mor"):
            cut = rng.randint(0, max(next_id[0], 1))
            t = t.delete_where(
                ex.lt(ex.Reference("id"), cut),
                mode=("copy-on-write" if kind == "delete_cow"
                      else "merge-on-read"))
            model = {k: v for k, v in model.items() if k >= cut}
        elif kind == "compact_where":
            g = rng.choice(grps)
            t = t.rewrite_data_files(
                where=ex.eq(ex.Reference("grp"), g),
                target_file_count=1)
            # invariant: compaction is content-preserving
        else:
            name = f"db.c{len(clones)}"
            clone = t.snapshot_to(cat, name)
            assert _state(clone) == model, \
                f"step {step}: clone {name} != source at clone time"
            clones.append((name, dict(model)))
        assert _state(t) == model, \
            f"step {step} ({kind}): table diverged from model"
    # clones stay frozen while the source kept mutating
    for name, frozen in clones:
        assert _state(cat.load_table(name, spark=spark)) == frozen, \
            f"clone {name} drifted after source mutations"
