"""Model-based sweep for transaction-scoped SQL (r15): random DML
sequences composed on one txn — the live table must NOT move until
commit, and after commit it must equal a dict model that applied the
statements in order; txn-scoped reads must see the model state
mid-flight. Pins atomicity + read-your-writes under composition."""

from __future__ import annotations

import random

import pytest

from iceberg_cpp_spark import IceSqlEngine
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.sources.catalog import FileSystemCatalog


def _schema():
    return it.Schema([
        it.NestedField(1, "id", it.LongType(), True),
        it.NestedField(2, "qty", it.LongType()),
    ])


def _state(eng, txn=None) -> dict:
    return {r["id"]: r["qty"] for r in
            eng.sql("SELECT * FROM ice.db.x", txn=txn).collect()}


def _rand_stmt(rng, eng, txn, model: dict, next_id: list) -> str:
    kind = rng.choice(["insert", "insert", "delete", "update", "merge"])
    if kind == "insert":
        rows = [(next_id[0] + i, rng.randint(0, 40))
                for i in range(rng.randint(1, 3))]
        next_id[0] += len(rows)
        vals = ", ".join(f"({i}, {q})" for i, q in rows)
        eng.sql(f"INSERT INTO ice.db.x VALUES {vals}", txn=txn)
        model.update(dict(rows))
        return f"INSERT {rows}"
    if kind == "delete":
        lo = rng.randint(0, 40)
        eng.sql(f"DELETE FROM ice.db.x WHERE qty >= {lo}", txn=txn)
        for k in [k for k, q in model.items()
                  if q is not None and q >= lo]:
            del model[k]
        return f"DELETE qty >= {lo}"
    if kind == "update":
        d = rng.randint(1, 5)
        eng.sql(f"UPDATE ice.db.x SET qty = qty + {d} WHERE id % 2 = 0",
                txn=txn)
        for k, q in model.items():
            if k % 2 == 0:
                model[k] = None if q is None else q + d
        return f"UPDATE even += {d}"
    ups = rng.sample(sorted(model) or [0], min(2, max(1, len(model))))
    new = next_id[0]
    next_id[0] += 1
    src = ", ".join(f"({i}, {i % 9})" for i in ups + [new])
    eng.sql(f"""
        MERGE INTO ice.db.x t USING (
            SELECT * FROM VALUES {src} AS v(id, qty)
        ) s ON t.id = s.id
        WHEN MATCHED AND s.qty > 4 THEN DELETE
        WHEN MATCHED THEN UPDATE SET qty = t.qty + s.qty
        WHEN NOT MATCHED THEN INSERT *
    """, txn=txn)
    for i in ups + [new]:
        sq = i % 9
        if i in model:
            if sq > 4:
                del model[i]
            else:
                model[i] = None if model[i] is None else model[i] + sq
        else:
            model[i] = sq
    return f"MERGE ups={ups} new={new}"


@pytest.mark.parametrize("seed", [5, 31])
def test_txn_scoped_sql_sequences_match_model(spark, tmp_loc, seed):
    cat = FileSystemCatalog(f"{tmp_loc}/wh")
    cat.create_namespace("db")
    cat.create_table("db.x", _schema())
    eng = IceSqlEngine(spark, cat)
    rng = random.Random(seed)
    rows = [(i, rng.randint(0, 30)) for i in range(5)]
    eng.sql("INSERT INTO ice.db.x VALUES "
            + ", ".join(f"({i}, {q})" for i, q in rows))
    pre = dict(rows)
    model = dict(rows)
    t = cat.load_table("db.x", spark=spark)
    txn = t.new_transaction()
    trace = []
    for step in range(5):
        trace.append(_rand_stmt(rng, eng, txn, model, [100 * (step + 1)]))
        # read-your-writes inside the txn ...
        assert _state(eng, txn=txn) == model, f"txn view diverged: {trace}"
        # ... and full isolation outside it
        assert _state(eng) == pre, f"live table moved pre-commit: {trace}"
    txn.commit()
    assert _state(eng) == model, f"post-commit divergence: {trace}"
    # the whole sequence landed as ONE metadata move: snapshots =
    # 1 seed + one per mutating statement, but exactly one CAS
    t2 = cat.load_table("db.x", spark=spark)
    assert len(t2.metadata.metadata_log) + 1 <= 3  # create+insert+txn
