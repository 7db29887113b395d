"""Model-based multi-table transaction sweep: random SQL DML across
TWO tables composes on a MultiTableTransaction while plain Python
dicts apply the same semantics; before commit BOTH tables must equal
their pre-transaction model (pending invisible), after commit both
must equal the post-transaction model (atomic cut), and randomly
injected CONCURRENT external commits force the batch onto the
rebase-and-retry path mid-sweep."""

from __future__ import annotations

import random

import pytest

from iceberg_cpp_spark import IceSqlEngine, MultiTableTransaction
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.sources.rest_catalog import (RestCatalog,
                                                    serve_rest_catalog)


def _schema():
    return it.Schema([
        it.NestedField(1, "id", it.LongType(), True),
        it.NestedField(2, "qty", it.LongType()),
    ])


def _state(eng, name) -> dict:
    return {r["id"]: r["qty"] for r in
            eng.sql(f"SELECT * FROM ice.db.{name}").collect()}


@pytest.fixture()
def rest_eng(spark, tmp_loc):
    server, uri = serve_rest_catalog()
    cat = RestCatalog(uri)
    cat.create_namespace("db")
    import os
    for n in ("x", "y"):
        cat.create_table(f"db.{n}", _schema(),
                         location=os.path.join(tmp_loc, n))
    yield cat, IceSqlEngine(spark, cat)
    server.shutdown()


@pytest.mark.parametrize("seed", [3, 8, 29])
def test_random_multi_table_batches_match_model(spark, rest_eng, seed):
    cat, eng = rest_eng
    rng = random.Random(seed)
    committed = {"x": {}, "y": {}}
    next_id = [0]
    # seed rows outside any transaction
    for n in ("x", "y"):
        rows = [(next_id[0] + i, rng.randint(0, 9)) for i in range(3)]
        next_id[0] += 3
        vals = ", ".join(f"({i}, {q})" for i, q in rows)
        eng.sql(f"INSERT INTO ice.db.{n} VALUES {vals}")
        committed[n].update(dict(rows))

    for batch in range(3):
        mtx = MultiTableTransaction(cat)
        pending = {n: dict(committed[n]) for n in ("x", "y")}
        enrolled: set = set()
        for _step in range(rng.randint(2, 4)):
            n = rng.choice(["x", "y"])
            enrolled.add(n)
            kind = rng.choice(["insert", "delete", "update"])
            if kind == "insert":
                i, q = next_id[0], rng.randint(0, 9)
                next_id[0] += 1
                eng.sql(f"INSERT INTO ice.db.{n} VALUES ({i}, {q})",
                        txn=mtx)
                pending[n][i] = q
            elif kind == "delete":
                cut = rng.randint(0, 9)
                eng.sql(f"DELETE FROM ice.db.{n} WHERE qty <= {cut}",
                        txn=mtx)
                pending[n] = {k: v for k, v in pending[n].items()
                              if v > cut}
            else:
                d = rng.randint(1, 5)
                lo = rng.randint(0, max(next_id[0], 1))
                eng.sql(f"UPDATE ice.db.{n} SET qty = qty + {d} "
                        f"WHERE id >= {lo}", txn=mtx)
                pending[n] = {k: (v + d if k >= lo else v)
                              for k, v in pending[n].items()}
        conc = {"x": {}, "y": {}}
        if rng.random() < 0.5:
            # concurrent external commit on one table AFTER the txn
            # opened: invisible to the txn's snapshot-isolated working
            # chain, folded in by the commit-time rebase (file-level
            # replay — the txn's logged deletes/updates must NOT
            # re-apply to the concurrent row)
            n = rng.choice(["x", "y"])
            i = next_id[0]
            next_id[0] += 1
            eng.sql(f"INSERT INTO ice.db.{n} VALUES ({i}, 99)")
            committed[n][i] = 99
            conc[n][i] = 99
        # pending invisible outside the txn scope; txn-scope reads see
        # the pending chain WITHOUT the concurrent row for ENROLLED
        # tables, and the committed state for unenrolled ones (reading
        # never enrolls a table into the batch)
        for n in ("x", "y"):
            assert _state(eng, n) == committed[n], \
                f"batch {batch}: pending leaked into {n} pre-commit"
            got = {r["id"]: r["qty"] for r in eng.sql(
                f"SELECT * FROM ice.db.{n}", txn=mtx).collect()}
            want = pending[n] if n in enrolled else committed[n]
            assert got == want, \
                f"batch {batch}: txn-scope read of {n} != model"
        mtx.commit()
        committed = {n: {**pending[n], **conc[n]} for n in ("x", "y")}
        for n in ("x", "y"):
            assert _state(eng, n) == committed[n], \
                f"batch {batch}: post-commit {n} != model"
