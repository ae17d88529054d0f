"""Sources / sinks (SURVEY.md §2.1) — the reference's import/export
command surface mapped onto Spark readers/writers.

Reference: DataFrame.read_csv (io/CSVReader.hpp + CSVSniffer.hpp),
from_parquet/from_arrow (engine/handlers/ArrowHandler.hpp:48-72),
from_db (src/engine/src/database/{Sqlite3,Postgres,MySQL}.cpp),
from_json/from_s3 (data_frame.py:1382-1483,1856-1891), sinks
(commands/DataFrameCommand.hpp:353-371). Spark's readers subsume all
of these; the wrappers below pin the reference's conventions (type
sniffing = inferSchema, double-epoch timestamps, role metadata) and
keep the scan declarative so Catalyst pushes filters/projections into
the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "read_csv",
    "read_parquet",
    "read_json",
    "read_orc",
    "read_jdbc",
    "from_pandas",
    "from_dict",
    "s3_path",
    "read_s3",
    "to_csv",
    "to_parquet",
    "to_json",
    "to_orc",
    "to_jdbc",
    "to_bucketed_table",
]


def read_csv(
    spark: SparkSession,
    paths: str | list[str],
    header: bool = True,
    sniff: bool = True,
    sep: str = ",",
    quotechar: str = '"',
    time_formats: list[str] | None = None,
) -> DataFrame:
    """CSV with type sniffing (reference CSVSniffer.hpp:15 /
    sniff_csv.py:19 → Spark inferSchema, which samples the same way)."""
    reader = (
        spark.read.option("header", header)
        .option("inferSchema", sniff)
        .option("sep", sep)
        .option("quote", quotechar)
        .option("mode", "PERMISSIVE")
    )
    if time_formats:
        reader = reader.option("timestampFormat", time_formats[0])
    return reader.csv(paths)


def read_parquet(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Parquet (reference ArrowHandler.hpp:52-54 read_parquet)."""
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.parquet(*paths)


def read_json(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """JSON lines (reference from_json, data_frame.py:1382-1427)."""
    return spark.read.json(paths)


def read_orc(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """ORC — the other columnar interchange format warehouses hand over
    (built into Spark SQL; same predicate/column pushdown as parquet).
    The reference has no ORC connector; this rounds out the columnar
    source surface for users migrating Hive-era data."""
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.orc(*paths)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table_or_query: str,
    properties: dict | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound=None,
    upper_bound=None,
) -> DataFrame:
    """DB import (reference from_db/from_query over sqlite/postgres/
    mysql connectors, commands/DatabaseCommand.hpp). Partitioned reads
    (partition_column + bounds) split the scan across executors — the
    single-node reference streams one connection; this is the scale-out
    difference, not an afterthought."""
    reader = spark.read.format("jdbc").option("url", url)
    if table_or_query.strip().lower().startswith("select"):
        reader = reader.option("query", table_or_query)
    else:
        reader = reader.option("dbtable", table_or_query)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    return reader.load()


def from_pandas(spark: SparkSession, pdf) -> DataFrame:
    """Arrow-path pandas import (reference from_pandas/from_arrow sends
    Arrow IPC over the socket, ArrowHandler.hpp:56-72; Spark's
    createDataFrame uses Arrow when spark.sql.execution.arrow is on)."""
    return spark.createDataFrame(pdf)


def from_dict(spark: SparkSession, data: dict) -> DataFrame:
    """Column-oriented dict import (reference from_dict,
    data_frame.py:1856-1875: {col: [values...]}) — transposed to rows
    driver-side (bounded: a dict literal is driver-sized by definition)."""
    cols = list(data.keys())
    n = len(next(iter(data.values()))) if data else 0
    for c, vals in data.items():
        if len(vals) != n:
            raise ValueError(f"column {c!r} has {len(vals)} values, expected {n}")
    rows = [tuple(data[c][i] for c in cols) for i in range(n)]
    return spark.createDataFrame(rows, cols)


def s3_path(bucket: str, key: str) -> str:
    """Pin the reference's (bucket, key) S3 convention
    (data_frame.py:1877-1891 from_s3) onto Spark's s3a:// scheme — the
    hadoop-aws connector handles credentials/region via standard
    AWS env/instance configuration."""
    return f"s3a://{bucket}/{key.lstrip('/')}"


def read_s3(
    spark: SparkSession,
    bucket: str,
    keys: str | list[str],
    fmt: str = "csv",
    **reader_kwargs,
) -> DataFrame:
    """S3 import (reference from_s3): maps (bucket, keys) to s3a:// URIs
    and delegates to the format reader. Untestable offline (no S3 in
    the sandbox) — the path convention is unit-tested."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    paths = [s3_path(bucket, k) for k in keys]
    if fmt == "csv":
        return read_csv(spark, paths, **reader_kwargs)
    if fmt == "parquet":
        return read_parquet(spark, paths)
    if fmt == "json":
        return read_json(spark, paths)
    raise ValueError(fmt)


def to_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"):
    df.write.mode(mode).option("header", header).csv(path)


def to_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
):
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def to_json(df: DataFrame, path: str, mode: str = "overwrite"):
    df.write.mode(mode).json(path)


def to_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
):
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def to_bucketed_table(
    df: DataFrame,
    name: str,
    buckets: int,
    bucket_cols: list[str] | str,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a BUCKETED table (hash-clustered files per bucket
    column): two tables bucketed the same way join WITHOUT a shuffle —
    the co-located-join strategy for repeated large-large joins (e.g.
    population x peripheral on the join key at every feature build).
    Bucket counts should match on both sides; pick ~(table size /
    shuffle-partition target)."""
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else bucket_cols
    w = df.write.mode(mode).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else sort_cols
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(name)


def to_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", properties: dict | None = None):
    w = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    for k, v in (properties or {}).items():
        w = w.option(k, v)
    w.save()
