"""Bronze layer: Hive-partitioned parquet landing zone.

Reference: src/dags/services/s3_writer.py:62-128 (pandas→parquet writes to
``bronze/{endpoint}/year=/grand_prix=/session_type=/``) and the per-transform
manual partition-path construction at read time
(silver/qualifying_transform.py:101-112). Here both collapse into Spark
built-ins: ``partitionBy`` on write, partition-column ``.filter`` on read —
Catalyst partition pruning replaces string-built glob paths (SURVEY §2.1 S3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BRONZE_ENDPOINTS = ("session_result", "drivers", "laps", "pit")
PARTITIONS = ("year", "grand_prix", "session_type")


def bronze_path(root: str, endpoint: str) -> str:
    return os.path.join(root, endpoint)


def write_bronze(df: DataFrame, root: str, endpoint: str, mode: str = "overwrite") -> None:
    (
        df.write.format("parquet")
        .partitionBy(*PARTITIONS)
        .option("partitionOverwriteMode", "dynamic")
        .mode(mode)
        .save(bronze_path(root, endpoint))
    )


def read_bronze(
    spark: SparkSession,
    root: str,
    endpoint: str,
    year: int | None = None,
    grand_prix: str | None = None,
    session_type: str | None = None,
    tolerate_corrupt: bool = False,
) -> DataFrame:
    """Schema-merging scan with partition-filter pushdown (S3+S4).

    ``mergeSchema`` mirrors bronze_readers.py:43,75,105,142 — bronze files are
    schema-inferred and may drift per landing batch.

    ``session_type`` prunes at the PATH level (glob + basePath) rather than
    with a post-filter: session_result's ``duration`` column is array-typed in
    qualifying partitions but scalar in race partitions (FIXTURES.md §1), so a
    whole-root mergeSchema scan would fail on the type conflict. This is the
    Spark-idiomatic version of the reference's manual partition-path
    construction (qualifying_transform.py:101-112), kept ONLY where the
    heterogeneous schema forces it.

    ``tolerate_corrupt`` skips unreadable files instead of failing the scan —
    the landing zone is written by external producers (reference: pandas
    uploads from MWAA tasks, s3_writer.py:62-128), so a half-uploaded or
    truncated object must not take down the whole batch. Default False:
    silent data loss is worse than a failed job unless explicitly opted in.
    """
    base = bronze_path(root, endpoint)
    reader = spark.read.option("mergeSchema", "true").option("basePath", base)
    if tolerate_corrupt:
        reader = reader.option("ignoreCorruptFiles", "true")
    if session_type is not None:
        df = reader.parquet(f"{base}/year=*/grand_prix=*/session_type={session_type}")
    else:
        df = reader.parquet(base)
    if year is not None:
        df = df.filter(F.col("year") == year)
    if grand_prix is not None:
        df = df.filter(F.col("grand_prix") == grand_prix)
    return df
