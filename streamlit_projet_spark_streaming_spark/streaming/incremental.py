"""Incremental gold maintenance: a streaming super-aggregate from which
every preference view derives (SURVEY.md §7 Phase 2, the scale path past
``refresh_gold``'s full recompute).

``refresh_gold`` re-reads all of silver per micro-batch — correct (view
semantics are full-table) but O(|silver|) every 15 s, which stops scaling
once silver is fact-sized. The four preference views, however, are all
re-aggregations of ONE additive statistic: per-(age_bucket, gender,
location, category) count / sum(spend) / sum(rating). That statistic is
incrementally maintainable from an append-only stream by a standard
streaming aggregation — per batch, Spark updates only the touched groups'
state — and its full cardinality is bounded by the dimension domains
(6×2×50×8 ≈ 5k rows), so each batch can emit the complete snapshot and
derive all four views from it for pennies.

  silver stream → groupBy(4 dims) count/sum  [incremental state, update-
    only-touched-keys; complete-mode emit of the ~5k-row cube]
  → foreachBatch: write cube snapshot + re-derive the 4 views (window
    ranks over the cube — dimension-sized work)

Late data: silver is append-only with ingest timestamps, so every row is
new by construction — no watermark needed for the cube (the hourly series
keeps its watermarked tumbling window, ``consumer.hourly_series_stream``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..plans.shopping_views import age_bucket_col
from ..operators.numeric import cents, ratio_round
from ..operators.relational import ordered_array_agg

#: The additive super-aggregate every preference view re-derives from.
CUBE_KEYS = ("age_bucket", "gender", "location", "category")


def super_aggregate(silver: DataFrame) -> DataFrame:
    """Per-(age_bucket, gender, location, category) additive stats —
    works identically on a batch frame or a stream (same code path is the
    stream/batch parity argument)."""
    return (
        silver.withColumn("age_bucket", age_bucket_col())
        .groupBy(*CUBE_KEYS)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("purchase_amount_usd").alias("amt"),
            F.sum("review_rating").alias("rat"),
            # non-null measure counts so downstream averages keep AVG's
            # NULL-ignoring semantics
            F.count("purchase_amount_usd").alias("n_amt"),
            F.count("review_rating").alias("n_rat"),
        )
    )


def _stats_top1_from_cube(cube: DataFrame, key: str, key_alias: str) -> DataFrame:
    by_cat = cube.groupBy(key, "category").agg(
        F.sum("cnt").alias("cnt"),
        F.sum("amt").alias("amt"),
        F.sum("rat").alias("rat"),
        F.sum("n_amt").alias("n_amt"),
        F.sum("n_rat").alias("n_rat"),
    )
    key_w = Window.partitionBy(key)
    rank_w = key_w.orderBy(F.desc("cnt"), F.asc("category"))
    return (
        by_cat.withColumn("orders", F.sum("cnt").over(key_w))
        .withColumn(
            "avg_spend",
            ratio_round(
                cents(F.sum("amt").over(key_w)), F.sum("n_amt").over(key_w) * 100, 4
            ),
        )
        .withColumn(
            "avg_rating",
            ratio_round(
                cents(F.sum("rat").over(key_w)), F.sum("n_rat").over(key_w) * 100, 4
            ),
        )
        .withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") == 1)
        .select(
            F.col(key).alias(key_alias),
            "orders",
            "avg_spend",
            "avg_rating",
            F.col("category").alias("top_category"),
        )
        .orderBy(key_alias)
    )


def views_from_cube(cube: DataFrame) -> dict[str, DataFrame]:
    """All four preference views re-derived from the ~5k-row cube —
    dimension-sized work, no silver scan."""
    loc_cat = cube.groupBy("location", "category").agg(
        F.sum("cnt").alias("cnt"),
        F.sum("amt").alias("amt"),
        F.sum("n_amt").alias("n_amt"),
    )
    loc_w = Window.partitionBy("location")
    loc_rank = loc_w.orderBy(F.desc("cnt"), F.asc("category"))
    v_location = (
        loc_cat.withColumn("orders", F.sum("cnt").over(loc_w))
        .withColumn(
            "avg_spend",
            ratio_round(
                cents(F.sum("amt").over(loc_w)), F.sum("n_amt").over(loc_w) * 100, 4
            ),
        )
        .withColumn("rn", F.row_number().over(loc_rank))
        .filter(F.col("rn") <= 3)
        .groupBy("location", "orders", "avg_spend")
        .agg(
            ordered_array_agg(F.col("cnt"), F.col("category"), ascending=False).alias(
                "top_categories"
            )
        )
        .orderBy("location")
    )
    v_agc = (
        cube.groupBy("age_bucket", "gender", "category")
        .agg(
            F.sum("cnt").alias("orders"),
            ratio_round(cents(F.sum("amt")), F.sum("n_amt") * 100, 4).alias(
                "avg_spend"
            ),
        )
        .orderBy("age_bucket", "gender", "category")
    )
    return {
        "v_age_preferences": _stats_top1_from_cube(cube, "age_bucket", "age_bucket"),
        "v_gender_preferences": _stats_top1_from_cube(cube, "gender", "gender"),
        "v_location_preferences": v_location,
        "v_age_gender_category": v_agc,
    }


def start_incremental_gold(
    spark: SparkSession,
    silver_dir: str,
    gold_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
    processing_time: str = "15 seconds",
) -> StreamingQuery:
    """Incrementally maintain the cube + views from the silver stream.

    complete-mode emit is the full ~5k-row cube each batch (Spark's agg
    state updates only the keys the batch touched); foreachBatch persists
    the snapshot and re-derives the views from it."""
    from .consumer import enrich_schema

    silver_stream = spark.readStream.schema(enrich_schema(spark)).parquet(silver_dir)
    cube_stream = super_aggregate(silver_stream)

    def _emit(batch_df: DataFrame, batch_id: int) -> None:
        cube = batch_df.persist()
        try:
            cube.write.mode("overwrite").parquet(os.path.join(gold_dir, "cube"))
            for name, df in views_from_cube(cube).items():
                df.write.mode("overwrite").parquet(os.path.join(gold_dir, name))
        finally:
            cube.unpersist()

    writer = (
        cube_stream.writeStream.foreachBatch(_emit)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def start_incremental_hourly(
    spark: SparkSession,
    silver_dir: str,
    gold_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
    processing_time: str = "15 seconds",
) -> StreamingQuery:
    """Incrementally maintain the hourly gold series: the tumbling-window
    aggregation (``consumer.hourly_series_stream``) keeps per-hour running
    state — each batch UPDATES only the windows it touches — and
    foreachBatch snapshots the full series for the polling serving layer.

    State-retention note: in ``complete`` output mode Structured Streaming
    does NOT evict window state past the watermark (the watermark only
    governs late-row admission in append/update modes), so state holds one
    row per distinct hour ever seen. That is the point here — the gold
    table IS the all-hours series, and a year of hours is ~8.8k tiny rows —
    but it means the "bounded state" guarantee is "one row per hour", not
    "only open windows". When watermark-bounded state is actually required
    (e.g. second-granularity windows over years), use
    ``start_incremental_hourly_update`` — the ``update``-mode +
    merge-on-write variant whose state holds only open windows.
    Companion to ``start_incremental_gold`` (a streaming query supports
    one aggregation, so the cube and the time series are separate queries
    over the same silver source)."""
    from .consumer import enrich_schema, hourly_series_stream

    silver_stream = spark.readStream.schema(enrich_schema(spark)).parquet(silver_dir)
    hourly = hourly_series_stream(silver_stream)

    def _emit(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(gold_dir, "hourly_series")
        )

    writer = (
        hourly.writeStream.foreachBatch(_emit)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def start_incremental_hourly_update(
    spark: SparkSession,
    silver_dir: str,
    gold_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
    processing_time: str = "15 seconds",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Bounded-state hourly gold: ``update``-mode emit + merge-on-write —
    the scale path past ``start_incremental_hourly``'s complete mode.

    Each micro-batch emits ONLY the hour windows it changed, and the
    watermark EVICTS window state once the event-time frontier passes it —
    so streaming state holds open windows only, regardless of how many
    hours the stream has ever seen (the guarantee complete mode cannot
    give; see the retention note on ``start_incremental_hourly``).

    foreachBatch merges the changed rows into the gold snapshot by window
    key: current snapshot ANTI JOIN changed-hours, UNION the delta,
    written to a staging dir and directory-swapped in. The swap is the
    portable stand-in for a transactional upsert — on a real deployment
    this is a Delta/Iceberg ``MERGE INTO`` keyed on ``hour`` (plain
    parquet has no atomic commit). Work per batch is
    O(|gold| rewrite + |delta|), vs complete mode's O(|all state|) emit;
    with a partitioned/transactional sink the rewrite drops to the
    touched partitions only.

    ``max_files_per_trigger`` caps silver files per micro-batch (test
    hook: forces a genuinely multi-batch drain under availableNow).
    """
    import shutil

    from .consumer import enrich_schema, hourly_series_stream

    reader = spark.readStream.schema(enrich_schema(spark))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    silver_stream = reader.parquet(silver_dir)
    hourly = hourly_series_stream(silver_stream)
    out = os.path.join(gold_dir, "hourly_series")

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        delta = batch_df.persist()
        try:
            if os.path.isdir(out):
                cur = delta.sparkSession.read.parquet(out)
                merged = cur.join(
                    delta.select("hour"), "hour", "left_anti"
                ).unionByName(delta)
            else:
                merged = delta
            staging = out + ".staging"
            merged.write.mode("overwrite").parquet(staging)
            old = out + ".old"
            shutil.rmtree(old, ignore_errors=True)
            if os.path.isdir(out):
                os.rename(out, old)
            os.rename(staging, out)
            shutil.rmtree(old, ignore_errors=True)
        finally:
            delta.unpersist()

    writer = (
        hourly.writeStream.foreachBatch(_merge)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
