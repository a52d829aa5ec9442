"""Partitioned gold-table writer + packed training-shard export.

The reference materializes its gold layer as BigQuery views
(``bigquery_views.sql:1-128``) and lets the warehouse own physical layout.
On Spark the LAYOUT IS THE QUERY PLAN of every downstream reader: a gold
table partitioned by the columns readers filter on turns those filters
into directory pruning (zero I/O for excluded partitions), and sorting
within files gives parquet min/max row-group statistics that prune
row-groups for range predicates. These writers make that layout explicit
and testable.

Scale stance (100 TB):

- ``repartition(partition_cols)`` before ``partitionBy`` means each output
  partition directory is written by the tasks that OWN that key — without
  it, every task holds a writer per live partition value (the classic
  small-files / memory blowup: tasks × partitions files).
- ``maxRecordsPerFile`` bounds file size without an extra shuffle; AQE's
  coalescing handles the opposite (too-small) end.
- Skewed partition values (one language = half the corpus) would make one
  task write half the data: pass ``spread`` > 1 to salt the repartition —
  files per hot partition rise to ``spread``, tasks stay balanced, and
  within-file sort order is preserved (the salt only splits, it never
  interleaves).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    sort_cols: Sequence[str] = (),
    max_records_per_file: int | None = None,
    spread: int = 1,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a hive-partitioned parquet gold table: directory
    per ``partition_cols`` value, rows sorted by ``sort_cols`` inside
    each file (row-group min/max pruning for downstream range filters).

    ``spread`` > 1 salts the pre-write repartition so a hot partition
    value is written by ``spread`` tasks (``spread`` files) instead of
    one — the write-side analogue of the salted join.
    """
    keys = [F.col(c) for c in partition_cols]
    if spread > 1:
        salt = F.pmod(F.xxhash64(*keys, F.monotonically_increasing_id()), F.lit(spread))
        # Explicit partition count: a byte-small salted shuffle is exactly
        # what AQE's coalescing folds back to one task (CLAUDE.md pitfall),
        # which would undo the spread. REPARTITION_BY_NUM is honored as-is.
        n = max(df.sparkSession.sparkContext.defaultParallelism, spread * 8)
        out = df.repartition(n, *keys, salt)
    else:
        out = df.repartition(*keys)
    if sort_cols:
        out = out.sortWithinPartitions(*partition_cols, *sort_cols)
    w = out.write.mode(mode)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.partitionBy(*partition_cols).parquet(path)


def read_gold(spark: SparkSession, path: str) -> DataFrame:
    """Read a gold table written by :func:`write_partitioned`. Partition
    columns come back from directory names; filters on them prune
    directories before any file opens (assert: ``PartitionFilters`` in
    the scan node, shrinking ``inputFiles()``)."""
    return spark.read.parquet(path)


def write_packed_shards(
    documents: DataFrame,
    path: str,
    token_col: str,
    budget: int = 256,
    n_buckets: int = 32,
    order_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Export a curated corpus as packed training shards: assign each doc
    a (bucket, pack) slot via ``sampling.greedy_pack`` (fixed-stride
    context packing), then write one directory per bucket with rows in
    (pack, position) order — exactly the layout a tokenizing shard
    consumer streams sequentially.

    The pack assignment join is key-aligned: ``greedy_pack`` output and
    ``documents`` join on the id column, then ONE repartition on
    ``bucket`` feeds both the directory layout and the within-file
    (pack, order) sort. Buckets are hash-balanced by construction, so no
    ``spread`` salt is needed here.
    """
    from ..operators.sampling import greedy_pack

    id_col = "doc_id"
    packs = greedy_pack(
        documents,
        id_col,
        token_col,
        budget=budget,
        n_buckets=n_buckets,
        order_col=order_col,
    )
    assembled = documents.join(packs.select(id_col, "bucket", "pack_ix"), id_col)
    (
        assembled.repartition("bucket")
        .sortWithinPartitions("bucket", "pack_ix", *([order_col] if order_col else []), id_col)
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(path)
    )


def merge_packed_shards(
    spark: SparkSession,
    path: str,
    token_col: str,
    budget: int,
    order_col: str | None = None,
) -> DataFrame:
    """Apply a :func:`~..operators.sampling.shard_merge_plan` to an
    existing :func:`write_packed_shards` layout IN PLACE, rewriting ONLY
    the bucket directories that contain merge rows — the consolidation
    pass a curation pipeline runs after dedup shrinks previously full
    packs (r8 verdict item 7 roadmap: the shard-merge half).

    Mechanics:

    - the plan is computed from the CURRENT on-disk pack totals (so the
      caller deletes/dedups rows first, then consolidates);
    - keeps retain their ``pack_ix``; each merge group takes a fresh id
      above the bucket's current maximum (``max pack_ix + 1 +
      merged_pack_ix``), so ids never collide and keeps' file contents
      are byte-stable;
    - the rewrite targets only affected buckets via **dynamic partition
      overwrite** (`partitionOverwriteMode=dynamic`): the written frame
      contains exactly the affected buckets' rows, so untouched bucket
      directories are never rewritten — at real scale this is the
      difference between consolidating 2% of shards and re-exporting
      the corpus.

    Returns the plan DataFrame (already consumed for the rewrite; the
    caller typically persists it as the consolidation audit record).
    """
    from ..operators.sampling import shard_merge_plan

    current = spark.read.parquet(path)
    plan = shard_merge_plan(current, token_col, budget=budget)
    # EAGER: the plan is both consumed below AND returned to the caller
    # — a lazy checkpoint materialized after the overwrite would
    # recompute from the REWRITTEN files (wrong data, or missing ones)
    plan = plan.localCheckpoint(eager=True)
    merges = plan.filter(F.col("action") == "merge")
    # per-bucket fresh-id offset: above every CURRENT pack id (keeps
    # and merges alike), so renumbered groups never collide
    offsets = plan.groupBy("bucket").agg(
        (F.max("pack_ix") + F.lit(1)).alias("_off")
    )
    affected = merges.select("bucket").distinct()
    rewritten = (
        current.join(affected, "bucket", "leftsemi")
        .join(
            merges.select("bucket", "pack_ix", "merged_pack_ix"),
            ["bucket", "pack_ix"],
            "left",
        )
        .join(offsets, "bucket")
        .withColumn(
            "pack_ix",
            F.when(
                F.col("merged_pack_ix").isNotNull(),
                F.col("_off") + F.col("merged_pack_ix"),
            ).otherwise(F.col("pack_ix")),
        )
        .drop("merged_pack_ix", "_off")
    )
    # EAGER materialization breaks the read-path lineage: the write
    # below overwrites the very files the plan scans (Spark rejects a
    # direct self-overwrite, and a lazy checkpoint would still read
    # during the write job). Cost is bounded by the AFFECTED buckets'
    # rows on executor storage — the consolidation fraction, not the
    # corpus; a staging-dir + atomic-swap variant is the alternative
    # when even that is too large.
    rewritten = rewritten.localCheckpoint(eager=True)
    sort_tail = [order_col] if order_col else []
    (
        rewritten.repartition("bucket")
        .sortWithinPartitions("bucket", "pack_ix", *sort_tail, "doc_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(path)
    )
    return plan
