import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from iceberg_cpp_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def tmp_loc():
    d = tempfile.mkdtemp(prefix="ice_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def lineitem(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


@pytest.fixture(scope="session")
def documents(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="session")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")
