"""Parse the reference's REAL metadata JSON fixtures
(src/iceberg/test/resources/TableMetadata*.json) — the same corpus its
table_metadata_test.cc/json_internal tests run against."""

import pytest

from iceberg_cpp_spark.core.metadata import read_table_metadata

RES = "/root/reference/src/iceberg/test/resources"


class TestValidFixtures:
    def test_v1_valid(self):
        m = read_table_metadata(f"{RES}/TableMetadataV1Valid.json")
        assert m.format_version == 1
        assert len(m.schemas) == 1
        assert m.schemas[0].fields[0].name == "x"
        assert len(m.partition_specs) == 1
        assert m.partition_specs[0].fields[0].name == "x"

    def test_v2_valid(self):
        m = read_table_metadata(f"{RES}/TableMetadataV2Valid.json")
        assert m.format_version == 2
        assert len(m.schemas) == 2
        assert m.current_schema_id == 1
        assert len(m.snapshots) == 2
        assert m.current_snapshot_id == m.snapshots[-1].snapshot_id
        assert m.last_sequence_number == 34
        # sort order carried
        assert m.default_sort_order_id == 3
        # snapshot log present
        assert len(m.snapshot_log) == 2

    def test_v2_minimal(self):
        m = read_table_metadata(f"{RES}/TableMetadataV2ValidMinimal.json")
        assert m.format_version == 2
        assert m.current_snapshot_id is None

    def test_v3_minimal(self):
        m = read_table_metadata(f"{RES}/TableMetadataV3ValidMinimal.json")
        assert len(m.schemas) == 1

    def test_statistics_files(self):
        m = read_table_metadata(f"{RES}/TableMetadataStatisticsFiles.json")
        assert len(m.statistics) == 1
        assert m.statistics[0]["snapshot-id"] == 3055729675574597004
        assert m.statistics[0]["blob-metadata"][0]["type"] == "ndv"
        assert m.statistics[0]["statistics-path"].endswith(".puffin")

    def test_partition_statistics_files(self):
        m = read_table_metadata(
            f"{RES}/TableMetadataPartitionStatisticsFiles.json")
        assert len(m.partition_statistics) == 1


class TestInvalidFixtures:
    @pytest.mark.parametrize("name,msg", [
        ("TableMetadataUnsupportedVersion.json", "unsupported format version"),
        ("TableMetadataV2CurrentSchemaNotFound.json", "current schema not found"),
        ("TableMetadataV2MissingSchemas.json", "missing schemas"),
        ("TableMetadataV2MissingSortOrder.json", "missing sort orders"),
        ("TableMetadataV2MissingPartitionSpecs.json", "missing partition specs"),
        ("TableMetadataV2MissingLastPartitionId.json", "missing last-partition-id"),
    ])
    def test_rejected(self, name, msg):
        with pytest.raises(ValueError, match=msg):
            read_table_metadata(f"{RES}/{name}")
