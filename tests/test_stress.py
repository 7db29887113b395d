"""Model-based DML stress: a random interleaving of appends, deletes
(rotating copy-on-write / merge-on-read / deletion-vector modes),
merges, updates, compactions and manifest rewrites must always equal a
driver-side dict model of the table — the cross-mode sequencing
equivalence no single-feature test pins."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.plans import expressions as ex
from iceberg_cpp_spark.table import IceTable


def _schema():
    return it.Schema([
        it.NestedField(1, "id", it.LongType(), True),
        it.NestedField(2, "data", it.StringType(), False),
    ])


class TestRandomizedMixedDml:
    def test_mixed_dml_equals_model(self, spark, tmp_loc):
        rng = random.Random(20260815)
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema())
        model: dict[int, str] = {}
        next_id = 0
        modes = ["copy-on-write", "merge-on-read", "deletion-vector"]

        def check(step, op):
            got = {r["id"]: r["data"] for r in t.to_df().collect()}
            assert got == model, (
                f"step {step} ({op}): "
                f"missing={sorted(set(model) - set(got))[:5]} "
                f"extra={sorted(set(got) - set(model))[:5]}")

        for step in range(14):
            op = rng.choice(
                ["append", "delete", "merge", "clause_merge", "update",
                 "compact", "rewrite_manifests"])
            if op == "append":
                n = rng.randint(1, 6)
                rows = [(next_id + i, f"a{next_id + i}") for i in range(n)]
                next_id += n
                t = t.append(spark.createDataFrame(
                    rows, "id long, data string"))
                model.update({k: v for k, v in rows})
            elif op == "delete" and model:
                mode = rng.choice(modes)
                cut = rng.choice(sorted(model))
                t = t.delete_where(ex.gt_eq(ex.Reference("id"), cut),
                                   mode=mode)
                model = {k: v for k, v in model.items() if k < cut}
            elif op == "merge" and model:
                upd = rng.sample(sorted(model), k=min(2, len(model)))
                ins = [next_id]
                next_id += 1
                src = [(k, f"m{k}") for k in upd + ins]
                mode = rng.choice([None, "merge-on-read"])
                t = t.merge_into(
                    spark.createDataFrame(src, "id long, data string"),
                    on=["id"], mode=mode)
                model.update({k: v for k, v in src})
            elif op == "clause_merge" and model:
                # r15 column-level MERGE in the cross-mode interleaving:
                # op-driven delete / delta update / conditional insert
                from iceberg_cpp_spark.table import (MatchedClause,
                                                     NotMatchedClause)

                keys = rng.sample(sorted(model), k=min(3, len(model)))
                new_k = next_id
                next_id += 1
                src = [(k, rng.choice("DU"), f"c{k}") for k in keys]
                src.append((new_k, "I", f"c{new_k}"))
                mode = rng.choice([None, "merge-on-read"])
                t = t.merge_into(
                    spark.createDataFrame(src, "id long, op string, "
                                               "tag string"),
                    on=["id"],
                    when_matched=[
                        MatchedClause("delete", condition="s.op = 'D'"),
                        MatchedClause("update",
                                      assignments={"data": "s.tag"})],
                    when_not_matched=[NotMatchedClause(
                        condition="s.op = 'I'",
                        values={"id": "s.id", "data": "upper(s.tag)"})],
                    mode=mode)
                for k, sop, tag in src:
                    if k in model:
                        if sop == "D":
                            del model[k]
                        else:
                            model[k] = tag
                    elif sop == "I":
                        model[k] = tag.upper()
            elif op == "update" and model:
                cut = rng.choice(sorted(model))
                t = t.update_where(
                    ex.eq(ex.Reference("id"), cut),
                    {"data": F.lit(f"u{cut}")},
                    mode=rng.choice([None, "merge-on-read"]))
                model[cut] = f"u{cut}"
            elif op == "compact":
                t = t.rewrite_data_files()
            elif op == "rewrite_manifests":
                t = t.rewrite_manifests(entries_per_manifest=3)
            check(step, op)
        # maintenance at the end: folds + expiry keep contents intact
        t = t.rewrite_position_deletes()
        t = t.expire_snapshots(keep_last=1)
        check("final", "fold+expire")
