"""Model sweep composing SQL DML with SCHEMA EVOLUTION: random
sequences interleave INSERT/UPDATE/DELETE/MERGE with ALTER TABLE ADD
COLUMN / RENAME COLUMN, checking the table against a dict model after
every statement. Single-statement tests can't see this composition:
an UPDATE after a RENAME must bind the new name, a MERGE after ADD
COLUMN must null-fill the old files' rows, and old files must keep
projecting by field id through any number of renames."""

from __future__ import annotations

import random

import pytest

from iceberg_cpp_spark import IceSqlEngine
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.sources.catalog import FileSystemCatalog


def _state(eng, cols: list) -> dict:
    rows = eng.sql("SELECT * FROM ice.db.ev").collect()
    return {r["id"]: tuple(r[c] for c in cols) for r in rows}


def _run_sequence(spark, tmp_loc, seed: int) -> None:
    cat = FileSystemCatalog(f"{tmp_loc}/wh")
    cat.create_namespace("db")
    cat.create_table("db.ev", it.Schema([
        it.NestedField(1, "id", it.LongType(), True),
        it.NestedField(2, "val", it.LongType()),
    ]))
    eng = IceSqlEngine(spark, cat)
    rng = random.Random(seed)
    cols = ["val"]          # mutable columns, current names, in order
    model: dict = {}        # id -> dict(col name -> value)
    next_id = [0]
    next_col = [0]
    trace: list = []

    def snapshot_model() -> dict:
        return {i: tuple(row.get(c) for c in cols)
                for i, row in model.items()}

    for step in range(12):
        kind = rng.choice(["insert", "insert", "update", "delete",
                           "merge", "add_col", "rename_col"])
        if kind == "insert":
            rows = [(next_id[0] + j,
                     *[rng.randint(0, 9) for _ in cols])
                    for j in range(rng.randint(1, 3))]
            next_id[0] += len(rows)
            vals = ", ".join("(" + ", ".join(map(str, r)) + ")"
                             for r in rows)
            eng.sql(f"INSERT INTO ice.db.ev VALUES {vals}")
            for r in rows:
                model[r[0]] = dict(zip(cols, r[1:]))
            trace.append(f"INSERT {len(rows)}")
        elif kind == "update":
            c = rng.choice(cols)
            delta = rng.randint(1, 5)
            lo = rng.randint(0, next_id[0] or 1)
            eng.sql(f"UPDATE ice.db.ev SET {c} = "
                    f"coalesce({c}, 0) + {delta} WHERE id >= {lo}")
            for i, row in model.items():
                if i >= lo:
                    row[c] = (row.get(c) or 0) + delta
            trace.append(f"UPDATE {c} += {delta} WHERE id>={lo}")
        elif kind == "delete":
            lo = rng.randint(0, next_id[0] or 1)
            hi = lo + rng.randint(0, 4)
            eng.sql(f"DELETE FROM ice.db.ev "
                    f"WHERE id BETWEEN {lo} AND {hi}")
            for i in [i for i in model if lo <= i <= hi]:
                del model[i]
            trace.append(f"DELETE [{lo},{hi}]")
        elif kind == "merge":
            # source keys must be UNIQUE (the r16-enforced MERGE
            # cardinality rule): sample only existing model keys so the
            # empty-table fallback can never collide with the fresh id
            up = rng.sample(sorted(model), min(2, len(model)))
            new = [next_id[0]]
            next_id[0] += 1
            src = ", ".join(
                "(" + ", ".join([str(i)] + ["7"] * len(cols)) + ")"
                for i in up + new)
            names = ", ".join(["id"] + cols)
            eng.sql(f"""
                MERGE INTO ice.db.ev t USING (
                    SELECT * FROM VALUES {src} AS v({names})
                ) s ON t.id = s.id
                WHEN MATCHED THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *
            """)
            for i in up + new:
                model[i] = {c: 7 for c in cols}
            trace.append(f"MERGE {up}+{new}")
        elif kind == "add_col":
            name = f"c{next_col[0]}"
            next_col[0] += 1
            eng.sql(f"ALTER TABLE ice.db.ev ADD COLUMN {name} BIGINT")
            cols.append(name)
            # existing rows read the new column as NULL
            trace.append(f"ADD {name}")
        else:  # rename a non-key column
            old = rng.choice(cols)
            new_name = f"r{next_col[0]}"
            next_col[0] += 1
            eng.sql(f"ALTER TABLE ice.db.ev "
                    f"RENAME COLUMN {old} TO {new_name}")
            cols[cols.index(old)] = new_name
            for row in model.values():
                if old in row:
                    row[new_name] = row.pop(old)
            trace.append(f"RENAME {old}->{new_name}")
        got = _state(eng, cols)
        want = snapshot_model()
        diff = [(k, got[k], want[k]) for k in got
                if k in want and got[k] != want[k]][:5]
        assert got == want, (
            f"seed {seed} diverged at step {step} after {trace}:\n"
            f" extra={sorted(set(got) - set(want))[:5]}\n"
            f" missing={sorted(set(want) - set(got))[:5]}\n"
            f" diff={diff}")


@pytest.mark.parametrize("seed", [3, 29])
def test_dml_composed_with_evolution(spark, tmp_loc, seed):
    _run_sequence(spark, tmp_loc, seed)
