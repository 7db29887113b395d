"""Model-based sweep for column-level MERGE (r15): random clause sets
(conditional DELETE / column-level UPDATE / column-list INSERT, in
random order) run through the SQL front end while a plain Python dict
applies the documented semantics — clauses in order, first condition
wins, untouched matched rows kept, unaccepted source rows dropped.
Runs in BOTH write.merge.mode settings, so copy-on-write and
merge-on-read clause plans are pinned equal under composition."""

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


# (sql text, model fn) per clause. Model fns take (trow, srow) where
# trow = (grp, qty) and srow = (grp, op, delta); they return the new
# trow, None for delete, or raise KeyError — cond handled separately.
_MATCHED_MENU = [
    ("WHEN MATCHED AND s.op = 'D' THEN DELETE",
     lambda op: op == "D", lambda t, s: None),
    ("WHEN MATCHED AND s.op = 'U' THEN UPDATE SET qty = t.qty + s.delta",
     lambda op: op == "U", lambda t, s: (t[0], t[1] + s[2])),
    ("WHEN MATCHED AND s.op = 'X' THEN "
     "UPDATE SET grp = upper(s.grp), qty = s.delta",
     lambda op: op == "X", lambda t, s: (s[0].upper(), s[2])),
]
_MATCHED_LAST = (  # conditionless — legal only as the last clause
    "WHEN MATCHED THEN UPDATE SET qty = s.delta * 2",
    lambda op: True, lambda t, s: (t[0], s[2] * 2))
_INSERT_MENU = [
    ("WHEN NOT MATCHED AND s.op = 'I' THEN "
     "INSERT (id, grp, qty) VALUES (s.id, s.grp, s.delta)",
     lambda op: op == "I", lambda sid, s: (s[0], s[2])),
]
_INSERT_LAST = (
    "WHEN NOT MATCHED THEN INSERT (id, grp, qty) "
    "VALUES (s.id, 'z', s.delta + 1)",
    lambda op: True, lambda sid, s: ("z", s[2] + 1))


def _rand_clauses(rng):
    matched = rng.sample(_MATCHED_MENU, rng.randint(0, 3))
    if rng.random() < 0.5:
        matched.append(_MATCHED_LAST)
    inserts = rng.sample(_INSERT_MENU, rng.randint(0, 1))
    if rng.random() < 0.5:
        inserts.append(_INSERT_LAST)
    if not matched and not inserts:
        matched = [_MATCHED_MENU[0]]
    return matched, inserts


def _step(rng, eng, model: dict, next_id: list) -> str:
    existing = sorted(model)
    up = rng.sample(existing, min(rng.randint(0, 3), len(existing)))
    new = [next_id[0] + i for i in range(rng.randint(0, 2))]
    next_id[0] += len(new)
    if not up and not new:
        new = [next_id[0]]
        next_id[0] += 1
    srows = {i: (rng.choice("abc"), rng.choice("DUXI"),
                 rng.randint(0, 30)) for i in up + new}
    matched, inserts = _rand_clauses(rng)
    vals = ", ".join(f"({i}, '{g}', '{o}', {d})"
                     for i, (g, o, d) in sorted(srows.items()))
    clause_sql = "\n".join(c[0] for c in matched)
    clause_sql += "\n" + "\n".join(c[0] for c in inserts)
    eng.sql(f"""
        MERGE INTO ice.db.m t USING (
            SELECT * FROM VALUES {vals} AS v(id, grp, op, delta)
        ) s ON t.id = s.id
        {clause_sql}
    """)
    # model: clause order, first condition wins
    for sid, s in srows.items():
        if sid in model:
            for _, cond, act in matched:
                if cond(s[1]):
                    out = act(model[sid], s)
                    if out is None:
                        del model[sid]
                    else:
                        model[sid] = out
                    break
        else:
            for _, cond, mk in inserts:
                if cond(s[1]):
                    model[sid] = mk(sid, s)
                    break
    return (f"MERGE src={sorted(srows.items())} "
            f"m={[c[0][:40] for c in matched]} "
            f"i={[c[0][:40] for c in inserts]}")


@pytest.mark.parametrize("mode", ["copy-on-write", "merge-on-read"])
@pytest.mark.parametrize("seed", [7, 23])
def test_random_clause_merges_match_model(spark, tmp_loc, mode, seed):
    cat = FileSystemCatalog(f"{tmp_loc}/wh")
    cat.create_namespace("db")
    cat.create_table("db.m", _schema(),
                     properties={"write.merge.mode": mode})
    eng = IceSqlEngine(spark, cat)
    rng = random.Random(seed)
    rows = [(i, rng.choice("abc"), rng.randint(0, 30)) for i in range(6)]
    vals = ", ".join(f"({i}, '{g}', {q})" for i, g, q in rows)
    eng.sql(f"INSERT INTO ice.db.m VALUES {vals}")
    model = {i: (g, q) for i, g, q in rows}
    next_id = [6]
    trace = []
    for step in range(8):
        trace.append(_step(rng, eng, model, next_id))
        got = {r["id"]: (r["grp"], r["qty"]) for r in
               eng.sql("SELECT * FROM ice.db.m").collect()}
        extra = {k: got[k] for k in set(got) - set(model)}
        missing = {k: model[k] for k in set(model) - set(got)}
        diff = [(k, got[k], model[k]) for k in got
                if k in model and got[k] != model[k]][:5]
        assert got == model, (
            f"[{mode}] divergence at step {step} after {trace}: "
            f"extra={extra} missing={missing} diff={diff}")
