"""Reader/Writer format registry (reference file_reader.h:100-113,
file_writer.h:86-100): pluggable file-format dispatch keyed by format
name. Spark supplies the actual IO — each entry just knows how to
configure ``spark.read`` / ``df.write`` for its format; custom formats
register a pair of callables.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

ReaderFn = Callable[[SparkSession, list[str], Optional[object]], DataFrame]
WriterFn = Callable[[DataFrame, str, dict], None]

_READERS: dict[str, ReaderFn] = {}
_WRITERS: dict[str, WriterFn] = {}


class UnknownFormatError(ValueError):
    pass


def register_reader(fmt: str, fn: ReaderFn) -> None:
    _READERS[fmt.lower()] = fn


def register_writer(fmt: str, fn: WriterFn) -> None:
    _WRITERS[fmt.lower()] = fn


def open_reader(fmt: str, spark: SparkSession, paths: list[str],
                schema=None) -> DataFrame:
    try:
        fn = _READERS[fmt.lower()]
    except KeyError:
        raise UnknownFormatError(
            f"no reader for format {fmt!r}; registered: {sorted(_READERS)}")
    return fn(spark, paths, schema)


def open_writer(fmt: str, df: DataFrame, path: str, options: Optional[dict] = None) -> None:
    try:
        fn = _WRITERS[fmt.lower()]
    except KeyError:
        raise UnknownFormatError(
            f"no writer for format {fmt!r}; registered: {sorted(_WRITERS)}")
    fn(df, path, options or {})


def registered_formats() -> dict[str, tuple[bool, bool]]:
    fmts = set(_READERS) | set(_WRITERS)
    return {f: (f in _READERS, f in _WRITERS) for f in sorted(fmts)}


def _spark_reader(fmt: str) -> ReaderFn:
    def read(spark, paths, schema=None):
        r = spark.read.format(fmt)
        if schema is not None:
            r = r.schema(schema)
        if fmt in ("csv",):
            r = r.option("header", "true")
        return r.load(paths)

    return read


def _spark_writer(fmt: str) -> WriterFn:
    def write(df, path, options):
        w = df.write.format(fmt).mode(options.pop("mode", "overwrite"))
        if fmt in ("csv",):
            w = w.option("header", "true")
        for k, v in options.items():
            w = w.option(k, v)
        w.save(path)

    return write


# built-ins (parity: {parquet, avro, orc} in file_format.h — avro needs
# the spark-avro module, registered so the dispatch exists and fails
# with Spark's clear error where the jar is absent; plus text formats)
for _fmt in ("parquet", "orc", "avro", "json", "csv"):
    register_reader(_fmt, _spark_reader(_fmt))
    register_writer(_fmt, _spark_writer(_fmt))
