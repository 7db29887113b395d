"""Model-based SQL DML sweep: random statement sequences (INSERT /
DELETE / UPDATE / MERGE, with parser-exercising WHERE shapes) run
through the SQL front end while a plain Python dict applies the same
semantics; after every statement the table must equal the model. This
is the SQL-layer mirror of test_stress's mixed-DML engine sweep — it
pins statement dispatch, literal typing and clause splitting UNDER
COMPOSITION, where single-statement tests can't see ordering bugs."""

from __future__ import annotations

import random

import pytest

from iceberg_cpp_spark import IceSqlEngine
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.sources.catalog import FileSystemCatalog


def _schema():
    return it.Schema([
        it.NestedField(1, "id", it.LongType(), True),
        it.NestedField(2, "grp", it.StringType()),
        it.NestedField(3, "qty", it.LongType()),
    ])


def _table_state(eng) -> dict:
    return {r["id"]: (r["grp"], r["qty"])
            for r in eng.sql("SELECT * FROM ice.db.m").collect()}


def _apply_random_op(rng, eng, model: dict, next_id: list) -> str:
    kind = rng.choice(["insert", "insert", "delete_pred", "update",
                       "merge", "delete_in"])
    grps = ["a", "b", "c"]
    if kind == "insert":
        rows = [(next_id[0] + i, rng.choice(grps), rng.randint(0, 50))
                for i in range(rng.randint(1, 4))]
        next_id[0] += len(rows)
        vals = ", ".join(f"({i}, '{g}', {q})" for i, g, q in rows)
        eng.sql(f"INSERT INTO ice.db.m VALUES {vals}")
        for i, g, q in rows:
            model[i] = (g, q)
        return f"INSERT {len(rows)}"
    if kind == "delete_pred":
        g = rng.choice(grps)
        lo, hi = sorted((rng.randint(0, 60), rng.randint(0, 60)))
        eng.sql(f"DELETE FROM ice.db.m WHERE grp = '{g}' "
                f"AND qty BETWEEN {lo} AND {hi}")
        for k in [k for k, (gg, qq) in model.items()
                  if gg == g and qq is not None and lo <= qq <= hi]:
            del model[k]
        return f"DELETE grp={g} qty in [{lo},{hi}]"
    if kind == "delete_in":
        ids = rng.sample(sorted(model) or [0], min(3, max(1, len(model))))
        eng.sql(f"DELETE FROM ice.db.m WHERE id IN "
                f"({', '.join(map(str, ids))})")
        for i in ids:
            model.pop(i, None)
        return f"DELETE ids {ids}"
    if kind == "update":
        g = rng.choice(grps)
        delta = rng.randint(1, 9)
        eng.sql(f"UPDATE ice.db.m SET qty = qty + {delta} "
                f"WHERE grp LIKE '{g}%'")
        for k, (gg, qq) in model.items():
            if gg is not None and gg.startswith(g):
                model[k] = (gg, None if qq is None else qq + delta)
        return f"UPDATE grp {g} += {delta}"
    # merge: upsert a mix of existing and new keys. Source keys must be
    # UNIQUE (the r16-enforced MERGE cardinality rule): sample existing
    # keys only from the model, never the [0] fallback that could
    # collide with the fresh-id counter on an empty table
    up = rng.sample(sorted(model), min(2, len(model)))
    new = [next_id[0], next_id[0] + 1]
    next_id[0] += 2
    src = ", ".join(f"({i}, 'm', {i % 7})" for i in up + new)
    eng.sql(f"""
        MERGE INTO ice.db.m t USING (
            SELECT * FROM VALUES {src} AS v(id, grp, qty)
        ) s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    """)
    # matched ids update, unmatched insert — either way the src row wins
    for i in up + new:
        model[i] = ("m", i % 7)
    return f"MERGE up={up} new={new}"


@pytest.mark.parametrize("seed", [11, 47])
def test_random_sql_dml_sequences_match_model(spark, tmp_loc, seed):
    cat = FileSystemCatalog(f"{tmp_loc}/wh")
    cat.create_namespace("db")
    cat.create_table("db.m", _schema())
    eng = IceSqlEngine(spark, cat)
    rng = random.Random(seed)
    model: dict = {}
    next_id = [0]
    trace = []
    for step in range(10):
        trace.append(_apply_random_op(rng, eng, model, next_id))
        got = _table_state(eng)
        assert got == model, (
            f"divergence at step {step} after {trace}: "
            f"extra={set(got) - set(model)} "
            f"missing={set(model) - set(got)} "
            f"diff={[k for k in got if k in model and got[k] != model[k]][:5]}")
