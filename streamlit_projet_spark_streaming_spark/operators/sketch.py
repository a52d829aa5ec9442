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
from pyspark.sql.types import LongType, StringType, StructField, StructType

_MG_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("est", LongType()),
    ]
)

#: MG summary schema for string keys (``provable_heavy_hitters``).
_MG_STR_SCHEMA = StructType(
    [
        StructField("key", StringType()),
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
    from .relational import spread_if_few_splits

    # CPU-bound Arrow stage over a scan-rooted projection: spread when
    # the parquet arrives as fewer splits than cores (CLAUDE.md rule),
    # else the whole MG pass runs as one task on small fixtures.
    keyed = spread_if_few_splits(df.select(key.cast("long").alias("key")))
    partials = keyed.mapInPandas(_mg_partial_mapper(k), _MG_SCHEMA)
    merged = partials.groupBy("key").agg(F.sum("est").alias("est"))
    return (
        merged.orderBy(F.desc("est"), F.asc("key"))
        .limit(top)
        .select("key", "est")
    )


def provable_heavy_hitters(df: DataFrame, key: Column, k: int = 8) -> DataFrame:
    """DETERMINISTIC heavy hitters: the classic MG two-pass — pass 1 is
    the mergeable Misra-Gries candidate sketch of :func:`heavy_hitters`,
    pass 2 joins the ≤ ``k·partitions`` candidates back to EXACT counts
    and keeps only the provably-heavy keys, ``true_count·(k+1) > N``
    (integer inequality — no float threshold).

    Why the output is partition-independent (hence oracle-checkable,
    VERDICT r6 item 4): any key with true > N/(k+1) survives EVERY
    merged MG summary with a positive estimate (per batch,
    est_b ≥ true_b − N_b/(k+1); keys absent from a batch summary have
    true_b ≤ N_b/(k+1), so summing over batches gives
    est ≥ true − N/(k+1) > 0) — so the candidate set always contains
    the provably-heavy set, and the exact-count filter then makes the
    result a pure function of the data. The estimates themselves stay
    partition-dependent, so they are NOT emitted.

    Scale shape: pass 1 shuffles ≤ k rows per batch (never per distinct
    key); pass 2 broadcast-semi-joins the tiny candidate set onto the
    scan and exact-counts only those keys (map-side combine over ≤
    candidate-count groups); N is a parquet-metadata count. Oracle:
    plain exact-frequency SQL with the same HAVING inequality.
    """
    from .relational import spread_if_few_splits

    # NULL keys are dropped EXPLICITLY on both engine and oracle sides:
    # pandas value_counts skips NaN in the MG pass and the candidate
    # equi-join drops NULLs anyway, while a plain SQL GROUP BY would
    # RETAIN a NULL group — an asymmetric contract that would go red the
    # day the fixture gains NULL keys (review catch). N counts only
    # non-null rows for the same reason.
    keyed = spread_if_few_splits(
        df.select(key.cast("string").alias("key")).filter(
            F.col("key").isNotNull()
        )
    )
    partials = keyed.mapInPandas(_mg_partial_mapper(k), _MG_STR_SCHEMA)
    candidates = (
        partials.groupBy("key")
        .agg(F.sum("est").alias("est"))
        .filter(F.col("est") > 0)
        .select("key")
    )
    total = (
        df.select(key.cast("string").alias("key"))
        .filter(F.col("key").isNotNull())
        .agg(F.count(F.lit(1)).alias("n_total"))
    )
    exact = (
        keyed.join(F.broadcast(candidates), "key")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("true_count") * (k + 1) > F.col("n_total"))
        .select("key", "true_count")
        .orderBy(F.desc("true_count"), F.asc("key"))
    )


def _cm_cell(j: int, key: Column, width: int) -> Column:
    """Row ``j``'s Count-Min cell for ``key``: 28 md5 bits of the
    seed-prefixed key, mod width — the portable cross-engine randomness
    source (`dedup.md5_hash_pieces` idiom; DuckDB replays it as
    ``('0x' || substr(md5(j || ':' || key), 1, 7))::BIGINT % width``)."""
    seeded = F.concat(F.lit(f"{j}:"), key.cast("string"))
    return (
        F.conv(F.substring(F.md5(seeded), 1, 7), 16, 10).cast("long")
        % F.lit(width)
    )


def count_min_estimate(
    df: DataFrame,
    key: Column,
    query_keys: DataFrame,
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Count-Min frequency estimates (Cormode & Muthukrishnan 2005) for
    ``query_keys`` (a one-column ``key`` DataFrame), plus the exact
    count for comparison.

    Unlike Misra-Gries, the sketch is FULLY deterministic given the
    md5-derived hash rows — so the whole pipeline (build + probe) has a
    DuckDB oracle, estimate ≥ true included. The classic guarantee
    (est ≤ true + εN with probability 1−δ for ε = e/width, δ = e^−depth)
    is probabilistic over keys, but every computed cell value is exact.

    Scale shape: the sketch build explodes ``depth`` hash rows per input
    row and partial-aggregates to ≤ depth·width rows per partition
    before the one shuffle — the sketch table is depth·width rows TOTAL
    at any input size. Probing broadcasts it against the (small) query
    key set; the exact-count branch is a filtered aggregate over the
    keyed input (it exists for the comparison column, not the sketch
    path). No state anywhere is proportional to distinct-key count.
    """
    keyed = df.select(key.cast("long").alias("key"))
    # query_keys feeds BOTH the probe explode and the exact-count
    # broadcast — without a checkpoint its (distinct) subplan replays
    # per consumer (the multi-consumer rule; review catch: 4 fact scans).
    query_keys = query_keys.select(
        F.col("key").cast("long").alias("key")
    ).localCheckpoint(eager=False)
    hashed = keyed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cm_cell(j, F.col("key"), width).alias("cell"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("h")
    ).select(F.col("h.j").alias("j"), F.col("h.cell").alias("cell"))
    sketch_tbl = hashed.groupBy("j", "cell").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    probes = query_keys.select(
        "key",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cm_cell(j, F.col("key"), width).alias("cell"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("h"),
    ).select("key", F.col("h.j").alias("j"), F.col("h.cell").alias("cell"))
    est = (
        probes.join(sketch_tbl, ["j", "cell"])
        .groupBy("key")
        .agg(F.min("cnt").alias("cm_estimate"))
    )
    exact = (
        keyed.join(F.broadcast(query_keys), "key")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    return est.join(exact, "key", "left").select(
        "key",
        F.coalesce("true_count", F.lit(0)).alias("true_count"),
        "cm_estimate",
    )


def bloom_prefilter_report(
    df: DataFrame,
    key: Column,
    member_pred: Column,
    n_bits: int = 1024,
    n_hashes: int = 3,
) -> DataFrame:
    """Bloom-filter semi-join prefilter with exact false-positive
    accounting — one summary row: how many distinct probe keys pass the
    filter vs how many are true members.

    Like the Count-Min entry, the md5-seeded bit positions are
    deterministic and DuckDB-replayable, so the WHOLE filter — build,
    probe, FP count — is oracle-checked. The point at 100 TB: a fact
    scan probes ``n_bits`` broadcast bits before any shuffle toward a
    dim join; rows failing the filter never enter the exchange. Spark's
    own runtime bloom pushdown does this invisibly; the operator makes
    the mechanism (and its FP rate) first-class and measurable.

    Plan shape: the member bit set is ≤ n_hashes·|members| distinct
    positions (broadcast); probing explodes n_hashes rows per DISTINCT
    key (one content-keyed distinct, then dimension-sized work); a key
    passes iff all its positions are set (count == n_hashes). The
    output is ONE row.
    """
    # members feeds bits + truth, probe_keys feeds probe_bits + per_key —
    # both small multi-consumer distinct sets → lazy checkpoints
    # (review catch: 4 fact scans where 2 suffice).
    members = (
        df.filter(member_pred)
        .select(key.cast("long").alias("key"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    bits = members.select(
        F.explode(
            F.array(
                *[_cm_cell(j, F.col("key"), n_bits) for j in range(n_hashes)]
            )
        ).alias("bit")
    ).distinct()
    probe_keys = (
        df.select(key.cast("long").alias("key"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    probe_bits = probe_keys.select(
        "key",
        F.explode(
            F.array(
                *[_cm_cell(j, F.col("key"), n_bits) for j in range(n_hashes)]
            )
        ).alias("bit"),
    )
    hits = (
        probe_bits.join(F.broadcast(bits), "bit")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_set"))
        .filter(F.col("n_set") == n_hashes)
        .select("key")
    )
    truth = members.withColumn("is_member", F.lit(1))
    per_key = (
        probe_keys.join(hits.withColumn("passed", F.lit(1)), "key", "left")
        .join(F.broadcast(truth), "key", "left")
        .select(
            "key",
            F.coalesce("passed", F.lit(0)).alias("passed"),
            F.coalesce("is_member", F.lit(0)).alias("is_member"),
        )
    )
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("is_member").cast("long").alias("n_members"),
        F.sum("passed").cast("long").alias("n_passed"),
        F.sum(
            ((F.col("passed") == 1) & (F.col("is_member") == 0)).cast("long")
        ).alias("n_false_positives"),
        F.sum(
            ((F.col("passed") == 0) & (F.col("is_member") == 1)).cast("long")
        ).alias("n_false_negatives"),
    )


#: HLL geometry: m = 64 registers (b = 6 bucket bits), rho from a
#: disjoint 28-bit md5 piece → rho ∈ [1, 29].
HLL_M = 64
HLL_RHO_CAP = 29
#: alpha_64 = 0.7213 / (1 + 1.079/64), embedded as the repr literal so
#: both engines parse the identical IEEE double.
HLL_ALPHA_M2 = float(0.7213 / (1 + 1.079 / 64) * 64 * 64)


def hll_distinct_estimate(
    df: DataFrame, key: Column, group: Column, salt: str = "hll"
) -> DataFrame:
    """Portable HyperLogLog (Flajolet et al. 2007) distinct-count
    estimate per group — like the Count-Min entry, md5-determinism
    makes this sketch fully ORACLE-CHECKED (Spark's builtin
    approx_count_distinct is HLL++ with a private hash, rows-only
    forever; this one both engines replay bit-identically).

    Register math stays exact: rho = 29 − len(bin(w)) from a 28-bit
    md5 piece (string length, no log2), and Σ 2^−M_j scales to the
    exact integer S = Σ 2^(29−M_j) — binary fractions, no float
    accumulation. The two float steps (α·m²·2^29/S and the
    small-range m·ln(m/V) branch) consume bit-identical integers, so
    ROUND is tie-free (off-grid transcendental/irrational-factor
    outputs).

    Plan: per-row md5 projection → groupBy(group, bucket) max(rho) —
    partial max combines map-side, the shuffle carries ≤ m rows per
    group per partition → per-group register fold. 28-bit hash space
    caps reliable estimates ~10^7 distinct; swap the pieces for two
    64-bit halves in production (same plan).
    """
    from .dedup import md5_hash_pieces

    piece1, piece2 = md5_hash_pieces(
        F.concat(F.lit(f"{salt}:"), key.cast("string"))
    )
    bucket = piece1 % HLL_M
    rho = F.when(piece2 == 0, F.lit(HLL_RHO_CAP)).otherwise(
        F.lit(HLL_RHO_CAP) - F.length(F.bin(piece2))
    )
    regs = (
        df.select(group.alias("grp"), bucket.alias("b"), rho.alias("rho"))
        .groupBy("grp", "b")
        .agg(F.max("rho").alias("m_j"))
    )
    # A PRESENT register always has M_j ≥ 1 (rho ∈ [1, 29] by
    # construction), so V — the zero-register count of classic HLL — is
    # exactly the number of EMPTY registers: m − n_regs. Empty registers
    # contribute 2^29 each to S via the count delta, no row generation.
    folded = regs.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_regs"),
        # SQL shiftleft takes a column shift amount (the Python
        # F.shiftleft helper only accepts a literal int).
        F.sum(F.expr(f"shiftleft(1L, {HLL_RHO_CAP} - m_j)")).alias(
            "s_present"
        ),
    )
    s_total = (
        F.col("s_present")
        + (F.lit(HLL_M) - F.col("n_regs"))
        * F.lit(1 << HLL_RHO_CAP)
    )
    v_zero = F.lit(HLL_M) - F.col("n_regs")
    est_raw = (
        F.lit(HLL_ALPHA_M2)
        * F.lit(float(1 << HLL_RHO_CAP))
        / s_total.cast("double")
    )
    est = F.when(
        (est_raw <= 2.5 * HLL_M) & (v_zero > 0),
        F.lit(float(HLL_M))
        * F.log(F.lit(float(HLL_M)) / v_zero.cast("double")),
    ).otherwise(est_raw)
    return folded.select(
        F.col("grp"),
        s_total.cast("long").alias("s_scaled"),
        v_zero.cast("long").alias("v_zero"),
        F.round(est, 4).alias("est_distinct"),
    )


def _hll_est(n_regs: Column, s_present: Column) -> Column:
    """HLL estimate from a (register count, Σ 2^(29−M_j)) fold — the
    exact math of :func:`hll_distinct_estimate`, factored so merged
    (union) register sets reuse it. Returns the UNROUNDED double."""
    s_total = (
        s_present + (F.lit(HLL_M) - n_regs) * F.lit(1 << HLL_RHO_CAP)
    )
    v_zero = F.lit(HLL_M) - n_regs
    est_raw = (
        F.lit(HLL_ALPHA_M2)
        * F.lit(float(1 << HLL_RHO_CAP))
        / s_total.cast("double")
    )
    return F.when(
        (est_raw <= 2.5 * HLL_M) & (v_zero > 0),
        F.lit(float(HLL_M))
        * F.log(F.lit(float(HLL_M)) / v_zero.cast("double")),
    ).otherwise(est_raw)


def hll_set_algebra(
    df: DataFrame,
    key: Column,
    in_a: Column,
    in_b: Column,
    salt: str = "hll",
) -> DataFrame:
    """HLL set algebra over two subsets of one key stream: distinct
    estimates for A, B, A∪B and the inclusion–exclusion overlap
    |A∩B| ≈ est(A) + est(B) − est(A∪B) — the mergeability property
    that makes HLL THE sketch for cross-partition distinct counting
    (registers union by per-bucket max, no rescan).

    One scan, one ≤ m-row shuffle: each row lands in its bucket with
    conditional per-set rho maxes, so the A/B/union register sets fold
    from the SAME 64-row table — the union register is provably
    max(M_A, M_B) per bucket, computed here directly as max over the
    filtered stream. md5-determinism keeps all four estimates fully
    ORACLE-CHECKED (cf. :func:`hll_distinct_estimate`).

    The overlap subtraction consumes three bit-identical doubles in a
    fixed expression order; its true value is off the 1e-4 grid
    (transcendental/irrational factors), so ROUND is tie-free.
    """
    from .dedup import md5_hash_pieces

    piece1, piece2 = md5_hash_pieces(
        F.concat(F.lit(f"{salt}:"), key.cast("string"))
    )
    bucket = piece1 % HLL_M
    rho = F.when(piece2 == 0, F.lit(HLL_RHO_CAP)).otherwise(
        F.lit(HLL_RHO_CAP) - F.length(F.bin(piece2))
    )
    rows = df.filter(in_a | in_b).select(
        in_a.alias("ia"),
        in_b.alias("ib"),
        bucket.alias("b"),
        rho.alias("rho"),
    )
    regs = rows.groupBy("b").agg(
        F.max(F.when(F.col("ia"), F.col("rho"))).alias("ma"),
        F.max(F.when(F.col("ib"), F.col("rho"))).alias("mb"),
        F.max("rho").alias("mu"),
    )

    def _fold(m: str) -> list[Column]:
        return [
            F.count(F.col(m)).alias(f"n_{m}"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col(m).isNotNull(),
                        F.expr(f"shiftleft(1L, {HLL_RHO_CAP} - {m})"),
                    )
                ),
                F.lit(0),
            ).alias(f"s_{m}"),
        ]

    folded = regs.agg(*(_fold("ma") + _fold("mb") + _fold("mu")))
    ea = _hll_est(F.col("n_ma"), F.col("s_ma"))
    eb = _hll_est(F.col("n_mb"), F.col("s_mb"))
    eu = _hll_est(F.col("n_mu"), F.col("s_mu"))
    return folded.select(
        F.round(ea, 4).alias("est_a"),
        F.round(eb, 4).alias("est_b"),
        F.round(eu, 4).alias("est_union"),
        F.round(ea + eb - eu, 4).alias("est_overlap"),
    )
