"""Model-based sweep for full-sync MERGE (r16): random clause sets
that COMPOSE all three groups — WHEN MATCHED, WHEN NOT MATCHED (BY
TARGET), and WHEN NOT MATCHED BY SOURCE — run through the SQL front
end while a plain Python dict applies the documented semantics: clause
order within each group, first condition wins, matched rows no clause
touches are kept, source rows no insert clause accepts are dropped,
and target rows whose key the source does not carry see ONLY the
by-source group. Runs in both write.merge.mode settings so the CoW
full-file rewrite and the MoR left-join delta plans are pinned equal
under composition."""

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


_MATCHED_MENU = [
    ("WHEN MATCHED AND s.op = 'D' THEN DELETE",
     lambda op: op == "D", lambda t, s: None),
    ("WHEN MATCHED AND s.op = 'U' THEN UPDATE SET qty = t.qty + s.delta",
     lambda op: op == "U", lambda t, s: (t[0], t[1] + s[2])),
]
_INSERT_LAST = (
    "WHEN NOT MATCHED THEN INSERT (id, grp, qty) "
    "VALUES (s.id, s.grp, s.delta)",
    lambda op: True, lambda sid, s: (s[0], s[2]))
# by-source clauses see the TARGET row only: (cond(trow), act(trow))
_BS_MENU = [
    ("WHEN NOT MATCHED BY SOURCE AND t.qty < 5 THEN DELETE",
     lambda t: t[1] < 5, lambda t: None),
    ("WHEN NOT MATCHED BY SOURCE AND t.grp = 'a' "
     "THEN UPDATE SET qty = t.qty + 100",
     lambda t: t[0] == "a", lambda t: (t[0], t[1] + 100)),
]
_BS_LAST = (  # conditionless — legal only as the last by-source clause
    "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET grp = 'sync'",
    lambda t: True, lambda t: ("sync", t[1]))


def _step(rng, eng, model: dict, next_id: list) -> str:
    existing = sorted(model)
    up = rng.sample(existing, min(rng.randint(0, 3), len(existing)))
    new = [next_id[0] + i for i in range(rng.randint(0, 2))]
    next_id[0] += len(new)
    if not up and not new:
        new = [next_id[0]]
        next_id[0] += 1
    srows = {i: (rng.choice("abc"), rng.choice("DU"),
                 rng.randint(0, 30)) for i in up + new}
    matched = rng.sample(_MATCHED_MENU, rng.randint(0, 2))
    inserts = [_INSERT_LAST] if rng.random() < 0.7 else []
    by_source = rng.sample(_BS_MENU, rng.randint(0, 2))
    if rng.random() < 0.5:
        by_source.append(_BS_LAST)
    if not by_source:
        by_source = [rng.choice(_BS_MENU)]
    vals = ", ".join(f"({i}, '{g}', '{o}', {d})"
                     for i, (g, o, d) in sorted(srows.items()))
    clause_sql = "\n".join(
        c[0] for c in matched + inserts + by_source)
    eng.sql(f"""
        MERGE INTO ice.db.m t USING (
            SELECT * FROM VALUES {vals} AS v(id, grp, op, delta)
        ) s ON t.id = s.id
        {clause_sql}
    """)
    # model: per key, exactly one group applies
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
    for tid in [k for k in list(model) if k not in srows]:
        for _, cond, act in by_source:
            if cond(model[tid]):
                out = act(model[tid])
                if out is None:
                    del model[tid]
                else:
                    model[tid] = out
                break
    return (f"MERGE src={sorted(srows.items())} "
            f"m={[c[0][:30] for c in matched]} "
            f"i={len(inserts)} bs={[c[0][:45] for c in by_source]}")


@pytest.mark.parametrize("mode", ["copy-on-write", "merge-on-read"])
@pytest.mark.parametrize("seed", [5, 31])
def test_random_by_source_merges_match_model(spark, tmp_loc, mode,
                                             seed):
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
    for step in range(6):
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
