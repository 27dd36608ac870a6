"""Parquet table sources for the driver-provided testdata.

Spark restatement of the reference's scan surface (SURVEY.md §2.1):
the S3 prefix scan (`S3Service.listObjects`,
application/image-processor/.../service/S3Service.java:99-121) becomes
``spark.read.parquet`` — file listing, column pruning and predicate
pushdown are Catalyst/Parquet built-ins, not hand-written pagination.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one testdata table (pushdown + pruning for free)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL entry points."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
