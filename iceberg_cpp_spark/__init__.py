"""iceberg_cpp_spark — a PySpark-native analytics engine with the
capabilities of apache/iceberg-cpp (reference: /root/reference).

Two halves (see SURVEY.md):
  (a) table-format + scan-planning capabilities (typed schemas with field
      IDs, snapshot-versioned metadata, manifests, partition transforms,
      an expression DSL, metadata-level file pruning, an append/commit
      protocol) re-implemented natively in Python + PySpark;
  (b) the relational operator surface (joins/aggs/windows/sorts/set-ops)
      and LLM-data-pipeline operators (dedup, similarity search, text
      analysis, multimodal plumbing) supplied by the Spark DataFrame API.

Design stance: metadata is data (manifests are DataFrames; pruning is
DataFrame filters), the data plane is 100% Spark (scans end in
``spark.read.parquet``), and only spec-exact kernels (murmur3 bucket,
bounds serde) are hand-written Python.
"""

from iceberg_cpp_spark.core.types import (
    Schema,
    NestedField,
    BooleanType,
    IntegerType,
    LongType,
    FloatType,
    DoubleType,
    DecimalType,
    DateType,
    TimeType,
    TimestampType,
    TimestampTzType,
    StringType,
    BinaryType,
    FixedType,
    UuidType,
    StructType,
    ListType,
    MapType,
)
from iceberg_cpp_spark.core.metadata import TableMetadata, Snapshot, PartitionSpec, PartitionField, SortOrder, SortField
from iceberg_cpp_spark.sources.catalog import InMemoryCatalog, FileSystemCatalog
from iceberg_cpp_spark.sql import IceSqlEngine
from iceberg_cpp_spark.table import (IceTable, MatchedClause,
                                     NotMatchedBySourceClause,
                                     NotMatchedClause)
from iceberg_cpp_spark.transaction import MultiTableTransaction

__version__ = "0.1.0"
