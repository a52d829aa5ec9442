"""Misra-Gries heavy-hitter guarantee vs exact counts (the sketch's
contract — its output set legitimately depends on partition boundaries,
so the driver check is rows-only and THIS is the correctness bound)."""

from pyspark.sql import functions as F

from streamlit_projet_spark_streaming_spark.operators.sketch import (
    heavy_hitters,
    provable_heavy_hitters,
)
from streamlit_projet_spark_streaming_spark.sources.catalog import load_table

from .conftest import SF_CORRECT

K = 50


def test_mg_guarantee_against_exact_counts(spark):
    events = load_table(spark, "events", SF_CORRECT)
    exact = {
        r["user_id"]: r["c"]
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n = sum(exact.values())
    thresh = n / (K + 1)
    # top large enough to keep every surviving counter
    out = {
        r["key"]: r["est"]
        for r in heavy_hitters(events, F.col("user_id"), k=K, top=10**6).collect()
    }
    # upper bound: estimates never exceed the true count
    for key, est in out.items():
        assert est <= exact[key], (key, est, exact[key])
    # lower bound + survival: every true heavy hitter is present with
    # est >= true - N/(k+1)
    for key, true in exact.items():
        if true > thresh:
            assert key in out, f"heavy hitter {key} (count {true}) dropped"
            assert out[key] >= true - thresh - 1e-9, (key, out[key], true, thresh)


def test_provable_heavy_hitters_partition_independent(spark):
    """The two-pass provably-heavy output is a pure function of the data:
    identical across radically different partitionings, and exactly the
    keys with true_count*(k+1) > N at their exact counts."""
    events = load_table(spark, "events", SF_CORRECT)
    k = 8
    base = provable_heavy_hitters(events, F.col("event_type"), k=k).collect()
    shuffled = provable_heavy_hitters(
        events.repartition(13, F.col("value")), F.col("event_type"), k=k
    ).collect()
    assert [tuple(r) for r in base] == [tuple(r) for r in shuffled]
    exact = {
        r["event_type"]: r["c"]
        for r in events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    n = sum(exact.values())
    expected = sorted(
        ((key, c) for key, c in exact.items() if c * (k + 1) > n),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert [tuple(r) for r in base] == expected
    assert expected, "fixture should yield a non-empty provably-heavy set"


def test_mg_topk_is_deterministic_given_plan(spark):
    """Two runs of the same plan on the same input produce the same
    top-20 (partitioning is stable within a session/input)."""
    events = load_table(spark, "events", SF_CORRECT)
    a = heavy_hitters(events, F.col("user_id")).collect()
    b = heavy_hitters(events, F.col("user_id")).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 20


def test_hll_estimate_accuracy_vs_exact(spark):
    """Portable HLL: per-type estimate within 4 standard errors
    (1.04/sqrt(64) ≈ 13%) of the exact distinct count — the classical
    HLL guarantee band, wide enough to be deterministic-stable here
    (and the estimator itself is oracle-checked bit-exactly)."""
    from streamlit_projet_spark_streaming_spark.operators.sketch import (
        hll_distinct_estimate,
    )
    from streamlit_projet_spark_streaming_spark.sources.catalog import load_table

    from .conftest import SF_CORRECT

    events = load_table(spark, "events", SF_CORRECT)
    est = {
        r["grp"]: r["est_distinct"]
        for r in hll_distinct_estimate(
            events, F.col("user_id"), F.col("event_type")
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, e in est.items():
        rel = abs(e - exact[k]) / exact[k]
        assert rel < 4 * 1.04 / 8, f"{k}: est {e} vs exact {exact[k]} ({rel:.2%})"


def test_hll_set_algebra_accuracy(spark):
    """Planted A/B sets with known overlap: all four estimates land
    within the HLL error band (~1.04/sqrt(64) ≈ 13% SE; allow 4 SE)
    and inclusion-exclusion is internally consistent."""
    from streamlit_projet_spark_streaming_spark.operators.sketch import (
        hll_set_algebra,
    )

    # |A| = 3000 (ids 0..2999), |B| = 3000 (ids 2000..4999), overlap 1000.
    rows = [(i, "a") for i in range(3000)] + [
        (i, "b") for i in range(2000, 5000)
    ]
    df = spark.createDataFrame(rows, "k long, s string")
    r = hll_set_algebra(
        df, F.col("k"), F.col("s") == "a", F.col("s") == "b"
    ).collect()[0]
    se = 1.04 / (64 ** 0.5)
    assert abs(r.est_a - 3000) <= 4 * se * 3000
    assert abs(r.est_b - 3000) <= 4 * se * 3000
    assert abs(r.est_union - 5000) <= 4 * se * 5000
    # overlap inherits the union's absolute error — band on |A∪B|.
    assert abs(r.est_overlap - 1000) <= 6 * se * 5000
    assert abs((r.est_a + r.est_b - r.est_union) - r.est_overlap) < 1e-6
