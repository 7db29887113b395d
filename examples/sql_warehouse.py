"""The SQL front end, end to end: a Spark user's view of the engine.

Everything below is plain SQL strings against an ``IceSqlEngine`` —
catalog DDL with Iceberg partition transforms, named-column inserts,
the DML triad (pruned DELETE / UPDATE / MERGE incl. the r15 CDC-upsert
clause shape), transaction-scoped statements (several DML published as
ONE CAS), time travel by snapshot, timestamp, branch or tag, CDC
reads, metadata tables, DESCRIBE EXTENDED / SHOW CREATE TABLE, and
maintenance procedures. Every statement maps onto the same IceTable
planes the Python API uses (one snapshot + CAS each; WHERE clauses
parse into the Expression DSL so deletes prune files, never full-scan).

Run: ``python examples/sql_warehouse.py``
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from iceberg_cpp_spark import IceSqlEngine  # noqa: E402
from iceberg_cpp_spark.session import get_spark
from iceberg_cpp_spark.sources.catalog import FileSystemCatalog


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    wh = tempfile.mkdtemp(prefix="sql_wh_")
    cat = FileSystemCatalog(f"{wh}/warehouse")
    cat.create_namespace("sales")
    eng = IceSqlEngine(spark, cat)  # identifiers bind as ice.sales.*

    # DDL: explicit columns + Iceberg partition transforms
    eng.sql("""
        CREATE TABLE ice.sales.orders (
            order_id BIGINT NOT NULL,
            region   STRING,
            amount   DECIMAL(10,2),
            ts       TIMESTAMP
        ) PARTITIONED BY (days(ts), bucket(4, order_id))
    """)

    # positional and named-column inserts
    eng.sql("""
        INSERT INTO ice.sales.orders VALUES
            (1, 'EU', 10.50, TIMESTAMP '2024-01-01T08:00:00'),
            (2, 'US', 20.00, TIMESTAMP '2024-01-02T09:00:00'),
            (3, 'EU', 7.25,  TIMESTAMP '2024-01-02T10:30:00')
    """)
    eng.sql("INSERT INTO ice.sales.orders (order_id, region) "
            "VALUES (4, 'APAC')")  # amount/ts fill NULL

    # snapshot ids are random — the LATEST one is the max sequence
    first = eng.sql(
        "SELECT snapshot_id AS s FROM ice.sales.orders.snapshots "
        "ORDER BY sequence_number DESC LIMIT 1").collect()[0]["s"]
    eng.sql("ALTER TABLE ice.sales.orders CREATE TAG day1")

    # the DML triad — the DELETE's WHERE parses into the Expression
    # DSL, so only files that can contain EU rows are rewritten
    eng.sql("DELETE FROM ice.sales.orders WHERE region = 'EU' "
            "AND amount < 10")
    eng.sql("UPDATE ice.sales.orders SET amount = amount * 1.1 "
            "WHERE region = 'US'")
    eng.sql("""
        MERGE INTO ice.sales.orders t USING (
            SELECT 2 AS order_id, 'US' AS region,
                   CAST(99.99 AS DECIMAL(10,2)) AS amount,
                   TIMESTAMP '2024-01-02T09:00:00' AS ts
            UNION ALL
            SELECT 5, 'EU', CAST(15.00 AS DECIMAL(10,2)),
                   TIMESTAMP '2024-01-03T11:00:00'
        ) s ON t.order_id = s.order_id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    """)

    # r15: the CDC-upsert MERGE — clause predicates + column-level
    # actions; the op column drives delete/update/insert per row
    eng.sql("""
        MERGE INTO ice.sales.orders t USING (
            SELECT 4 AS order_id, 'D' AS op, 0.0 AS delta
            UNION ALL SELECT 5, 'U', 5.00
            UNION ALL SELECT 6, 'I', 42.00
        ) s ON t.order_id = s.order_id
        WHEN MATCHED AND s.op = 'D' THEN DELETE
        WHEN MATCHED THEN UPDATE SET amount = t.amount + s.delta
        WHEN NOT MATCHED AND s.op = 'I' THEN
            INSERT (order_id, region, amount)
            VALUES (s.order_id, 'NEW', s.delta)
    """)

    # r15: several statements, ONE atomic commit (txn-scoped SQL)
    t = cat.load_table("sales.orders", spark=spark)
    txn = t.new_transaction()
    eng.sql("INSERT INTO ice.sales.orders (order_id, region) "
            "VALUES (7, 'EU')", txn=txn)
    eng.sql("DELETE FROM ice.sales.orders WHERE order_id = 6", txn=txn)
    txn.commit()

    # r15: stage on a branch, audit, publish with fast_forward
    eng.sql("ALTER TABLE ice.sales.orders CREATE BRANCH staging")
    eng.sql("INSERT INTO ice.sales.orders.branch_staging "
            "VALUES (8, 'EU', 1.00, TIMESTAMP '2024-01-04T00:00:00')")
    assert eng.sql("SELECT * FROM ice.sales.orders WHERE order_id = 8"
                   ).count() == 0          # invisible on main
    eng.sql("CALL ice.system.fast_forward(table => 'sales.orders', "
            "branch => 'main', to => 'staging')")

    print("current state:")
    eng.sql("SELECT * FROM ice.sales.orders ORDER BY order_id").show()
    print("DESCRIBE EXTENDED:")
    eng.sql("DESCRIBE EXTENDED ice.sales.orders").show(truncate=False)
    print("SHOW CREATE TABLE:")
    print(eng.sql("SHOW CREATE TABLE ice.sales.orders")
          .collect()[0]["createtab_stmt"])
    print("as of the day1 tag:")
    eng.sql("SELECT count(*) AS n FROM ice.sales.orders "
            "VERSION AS OF 'day1'").show()
    print(f"changes since snapshot {first}:")
    eng.sql(f"SELECT _change_type, order_id FROM ice.sales.orders "
            f"CHANGES SINCE {first} "
            f"ORDER BY _change_ordinal, order_id, _change_type").show()

    # maintenance through CALL procedures
    eng.sql("CALL ice.system.rewrite_data_files("
            "table => 'sales.orders', target_file_count => 2)")
    eng.sql("CALL ice.system.expire_snapshots("
            "table => 'sales.orders', retain_last => 2)")
    print("history after maintenance:")
    eng.sql("SELECT snapshot_id, operation "
            "FROM ice.sales.orders.snapshots").show(truncate=False)

    # r15: zero-copy clone + CDC view + stats + SHOW surfaces
    eng.sql("CALL ice.system.snapshot(source_table => 'sales.orders', "
            "table => 'sales.orders_dev')")   # shares data files
    print("clone rows (no data copied; clone GC is fenced off):")
    eng.sql("SELECT count(*) AS n FROM ice.sales.orders_dev").show()
    eng.sql("CALL ice.system.ancestors_of("
            "table => 'sales.orders')").show(truncate=False)
    eng.sql("CALL ice.system.create_changelog_view("
            "table => 'sales.orders', changelog_view => 'orders_cdc')")
    spark.sql("SELECT _change_type, count(*) AS n FROM orders_cdc "
              "GROUP BY _change_type").show()
    eng.sql("CALL ice.system.compute_table_stats("
            "table => 'sales.orders')")
    eng.sql("SHOW PARTITIONS ice.sales.orders").show(truncate=False)
    eng.sql("SHOW VIEWS IN ice").show()

    spark.stop()
    shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
