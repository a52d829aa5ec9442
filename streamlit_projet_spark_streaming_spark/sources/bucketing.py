"""Bucketed-table layout for co-located joins (SURVEY.md §1.4/§4 scale
notes; catalog docstring: "orders and lineitem bucketed by their join
keys").

At 100 TB the dominant cost of a fact⋈fact join is shuffling both sides
by the key. Bucketing pre-hashes rows into a fixed number of files per
key at WRITE time, so a join between two tables bucketed the same way
reads co-located buckets and Spark plans a SortMergeJoin with ZERO
Exchange on either side — the shuffle is paid once at ingest, amortized
over every subsequent join. This is the batch analog of co-partitioned
state in the streaming layer.

Spark requires bucketed tables to live in the session catalog
(``saveAsTable``), not bare parquet paths — bucket metadata is a catalog
property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) managed table.

    Sorting within buckets lets the join skip its per-task sort too
    (SortMergeJoin reads pre-sorted bucket files).
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key — plans as
    a SortMergeJoin with no Exchange on either side (assert via
    ``.explain``).

    The merge hint pins the strategy at fixture scale, where the planner
    would otherwise broadcast the (tiny) build side and skip bucketed
    reading; at fact⋈fact scale SortMergeJoin is what the planner picks
    unhinted, and the bucket layout then removes both shuffles.
    """
    return spark.table(left_table).join(
        spark.table(right_table).hint("merge"), on
    )
