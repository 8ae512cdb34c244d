"""Bucketed-table co-location: shuffle-free cell joins.

At 10^12 documents the cell equi-join's exchange is the dominant cost
when the zone side is too big to broadcast.  Writing both sides bucketed
by ``cell_id`` into the warehouse lets Spark plan a SortMergeJoin with
NO Exchange on either side (bucket pruning + co-located scan) — the
cluster-scale equivalent of Iceberg's ``bucket(N, cell_id)`` hidden
partitioning (see sources/iceberg.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, n_buckets: int = 16,
                   bucket_col: str = "cell_id") -> None:
    """Persist as a bucketed managed table (overwrites)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str = "cell_id", how: str = "inner") -> DataFrame:
    """Join two co-bucketed tables on the bucket key — planned without a
    shuffle on either side when bucket counts match."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
