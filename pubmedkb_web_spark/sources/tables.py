"""Table IO.

The engine's canonical layout is an Iceberg catalog (the north-rule source
is an Iceberg table of source-code repositories); this sandbox image has no
Iceberg runtime jar, so the adapter falls back to plain parquet directories
with identical logical schemas. All call sites go through these functions —
swapping in Iceberg is a config change, not a code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Schema  # type: ignore[attr-defined]
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, root: str, name: str) -> DataFrame:
    """Read a logical table: Iceberg identifier if configured, else
    ``{root}/{name}.parquet`` or ``{root}/{name}`` directory."""
    if iceberg_available(spark) and "/" not in root:
        return spark.read.format("iceberg").load(f"{root}.{name}")
    for suffix in (f"{name}.parquet", name):
        p = os.path.join(root, suffix)
        if os.path.exists(p):
            return spark.read.parquet(p)
    raise FileNotFoundError(f"table {name} not found under {root}")


def write_table(df: DataFrame, root: str, name: str, partition_by: list[str] | None = None) -> None:
    spark = df.sparkSession
    if iceberg_available(spark) and "/" not in root:
        df.writeTo(f"{root}.{name}").createOrReplace()
        return
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(os.path.join(root, name))


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All driver-provided tables from /root/testdata/sf*/ (TESTDATA.md)."""
    return {t: read_table(spark, sf_dir, t) for t in TESTDATA_TABLES}
