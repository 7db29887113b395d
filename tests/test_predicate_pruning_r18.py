"""r18 (guide §4): delete planning prunes opaque-leg reads to the
predicate's columns; referenced_names walks the expression tree."""
import os

from iceberg_cpp_spark import IceTable
from iceberg_cpp_spark.core.types import schema_from_spark
from iceberg_cpp_spark.plans import expressions as ex


def test_referenced_names_walks_tree():
    e = (ex.lt(ex.Reference("a"), 1) & ex.eq(ex.Reference("b"), 2)) \
        | ~ex.is_null(ex.Reference("c"))
    assert ex.referenced_names(e) == {"a", "b", "c"}
    assert ex.referenced_names(ex.TrueExp()) == set()
    assert ex.referenced_names(
        ex.eq(ex.month(ex.Reference("d")), 3)) == {"d"}


def test_predicate_columns_maps_to_top_level(spark, tmp_loc, lineitem):
    t = IceTable.create(spark, os.path.join(tmp_loc, "t"),
                        schema_from_spark(lineitem.schema))
    e = ex.lt(ex.Reference("l_quantity"), 5.0) \
        & ex.eq(ex.Reference("l_returnflag"), "R")
    assert t._predicate_columns(e) == ["l_quantity", "l_returnflag"]
    # unknown reference -> None (read everything, never drop a column
    # the filter needs)
    assert t._predicate_columns(ex.eq(ex.Reference("nope"), 1)) is None


def test_mor_delete_on_orc_prunes_and_matches(spark, tmp_loc, lineitem):
    """End-to-end: a MoR delete over an ORC-imported file with the
    pruned read still deletes exactly the matching rows."""
    import glob

    sup = lineitem.select("l_orderkey", "l_quantity", "l_returnflag") \
                  .limit(200)
    schema = schema_from_spark(sup.schema)
    orc_dir = os.path.join(tmp_loc, "orc")
    sup.coalesce(1).write.mode("overwrite").orc(orc_dir)
    t = IceTable.create(spark, os.path.join(tmp_loc, "t2"), schema)
    t = t.add_files(sorted(glob.glob(os.path.join(orc_dir, "*.orc"))))
    t = t.delete_where(ex.eq(ex.Reference("l_returnflag"), "R"),
                       mode="merge-on-read")
    expect = sup.filter("l_returnflag <> 'R'").count()
    assert t.to_df().count() == expect
