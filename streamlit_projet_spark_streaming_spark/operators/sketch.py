"""Mergeable frequency sketches: distributed Misra-Gries heavy hitters.

Why a sketch when exact top-k exists (``top_categories_by_revenue``,
``value_counts_event_type``): the exact form shuffles one row per
DISTINCT key. For a high-cardinality key at 100 TB (user ids, URLs,
n-grams) that shuffle is itself data-sized. A Misra-Gries summary is
O(k) PER PARTITION regardless of input size, and MG summaries are
mergeable with additive error (Agarwal et al., "Mergeable Summaries",
PODS 2012) — so the shuffle moves ``k·partitions`` rows, a constant per
task.

Guarantee carried through the merge (pytest-pinned,
``tests/test_sketch.py``): with ``k`` counters over ``N`` rows,

    true_count − N/(k+1)  ≤  estimate  ≤  true_count

so every key with true_count > N/(k+1) survives with a positive
estimate. Output sets depend on partition boundaries (a key straddling
the decrement in one partitioning may not in another), so the registry
entry is rows-only; the pytest bound checks the guarantee against exact
counts, which IS the sketch's contract.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

_MG_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("est", LongType()),
    ]
)


def _mg_partial_mapper(k: int):
    """Per-Arrow-batch Misra-Gries summary: exact batch counts, then the
    MG decrement — subtract the (k+1)-th largest count from all, keep
    the ≤ k positive survivors. Output ≤ k rows per batch."""
    import pandas as pd

    def _summarize(batches: Iterator) -> Iterator:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            counts = pdf["key"].value_counts()
            if len(counts) > k:
                d = counts.iloc[k]
                counts = (counts - d).head(k)
                counts = counts[counts > 0]
            yield pd.DataFrame(
                {"key": counts.index.to_numpy(), "est": counts.to_numpy()}
            )

    return _summarize


def heavy_hitters(
    df: DataFrame, key: Column, k: int = 50, top: int = 20
) -> DataFrame:
    """Approximate top-``top`` heavy hitters of ``key`` with ``k``
    Misra-Gries counters per partition.

    Plan shape: one Arrow map stage emits ≤ k (key, est) rows per batch
    (the sketch IS the map-side combine); merging is a plain
    groupBy(key).sum over ``k·partitions`` rows (summing MG estimates is
    the mergeable-summaries union: errors add, bounded by Σ N_i/(k+1) ≤
    N/(k+1) since each partition's decrement is at most its own
    undercount); the final top-``top`` is a TakeOrderedAndProject.
    Nothing anywhere is proportional to the number of DISTINCT keys —
    the property that makes this the 100 TB path for high-cardinality
    frequency queries.
    """
    keyed = df.select(key.cast("long").alias("key"))
    partials = keyed.mapInPandas(_mg_partial_mapper(k), _MG_SCHEMA)
    merged = partials.groupBy("key").agg(F.sum("est").alias("est"))
    return (
        merged.orderBy(F.desc("est"), F.asc("key"))
        .limit(top)
        .select("key", "est")
    )
