"""Deduplication operators for large-scale text corpora (extension layer).

No reference counterpart (SURVEY.md §7 Phase 4) — these are the operators a
100 TB training-data pipeline needs. All are pure DataFrame compositions;
the only shuffles are on content-derived keys (normalized text, shingles,
band hashes), which distribute uniformly by construction.

Scale ladder (each step is the scale path for the previous one):
  exact hash-groupBy  →  n-gram Jaccard (quadratic in bucket, exact)
  →  MinHash + LSH banding (near-linear candidate generation, then exact
     verification only on candidates)  →  SimHash (constant-size signature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Normalized text: lowercase, whitespace collapsed, trimmed.
def _norm(col: F.Column) -> F.Column:
    return F.trim(F.lower(F.regexp_replace(col, r"\s+", " ")))


#: SQL twin of ``_norm`` for DuckDB oracles (needs the 'g' flag).
NORM_SQL = "trim(lower(regexp_replace({col}, '\\s+', ' ', 'g')))"


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact dedup via hash-groupBy on normalized text.

    Returns one row per distinct normalized text: the representative
    (min doc_id) and the duplicate count. Single shuffle on the text hash;
    at 100 TB you'd groupBy ``xxhash64(norm)`` instead of the full string
    to shrink shuffle width (same result, collision odds ~2^-64).
    """
    return (
        documents.select(F.col("doc_id"), _norm(F.col("text")).alias("t"))
        .groupBy("t")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_doc_id", "n_copies")
    )


def prefix_fingerprint_dups(documents: DataFrame, prefix_len: int = 40) -> DataFrame:
    """Fingerprint-based duplicate groups: md5 of the normalized prefix.

    A cheap document-fingerprint dedup (same shape as URL/host dedup in web
    corpora): groups sharing a fingerprint with >1 member are duplicate
    clusters. md5 is engine-portable (DuckDB computes the identical digest).
    """
    fp = F.md5(F.substring(_norm(F.col("text")), 1, prefix_len))
    return (
        documents.select(F.col("doc_id"), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .select("fingerprint", "keep_doc_id", "n_copies")
    )


def shingles(documents: DataFrame, k: int = 5) -> DataFrame:
    """Distinct character k-gram shingle set per document.

    ``sequence(1, len-k+1)`` + explode + substring — all builtin, pipelined
    into the scan. Output: (doc_id, sh).
    """
    norm = documents.select(F.col("doc_id"), _norm(F.col("text")).alias("t"))
    return (
        norm.filter(F.length("t") >= k)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.length("t") - (k - 1))).alias("i"),
            "t",
        )
        .select("doc_id", F.expr(f"substring(t, i, {k})").alias("sh"))
        .distinct()
    )


def ngram_jaccard_pairs(
    documents: DataFrame, k: int = 5, threshold: float = 0.6
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (doc_a < doc_b).

    Shingle-join algorithm: distinct shingles per doc → self-join on the
    shingle → intersection counts → |A∪B| = |A| + |B| − |A∩B|.
    Only docs sharing ≥1 shingle ever meet, so the join graph is sparse.

    Scale note: the shingle join is quadratic inside hot shingle buckets —
    fine here, and the honest baseline; ``minhash_lsh_pairs`` is the
    near-linear scale path that reproduces this output approximately.
    """
    sh = shingles(documents, k)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))

    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def minhash_signatures(documents: DataFrame, k: int = 5, num_hashes: int = 32) -> DataFrame:
    """MinHash signature per document: sig[i] = min over shingles of
    xxhash64(i, shingle).

    One groupBy computes all ``num_hashes`` minima as parallel aggregates —
    a single shuffle regardless of signature width.
    """
    sh = shingles(documents, k)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    documents: DataFrame,
    k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.6,
) -> DataFrame:
    """MinHash + LSH banding near-dup candidates, exact-verified.

    Pipeline: signatures → band hashes (bands × rows layout) → bucket join
    on (band_id, band_hash) → candidate pairs → exact Jaccard verification
    (join back to shingle sets) → pairs ≥ threshold.

    This is the 100 TB dedup path: candidate generation is near-linear
    (each doc emits ``bands`` bucket rows; only same-bucket docs pair), and
    the quadratic exact check runs only on candidates. With 32 hashes / 8
    bands / 4 rows the S-curve crosses ~0.5 Jaccard, so recall at the 0.6
    threshold is high but not guaranteed — hence no SQL oracle; the test
    suite asserts candidates ⊆ exact pairs + recall bound.
    """
    sig = minhash_signatures(documents, k, num_hashes)
    rows_per_band = num_hashes // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.xxhash64(
                *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    buckets = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_hash")

    a, b = buckets.alias("a"), buckets.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    exact = ngram_jaccard_pairs(documents, k, threshold)
    return candidates.join(exact, ["doc_a", "doc_b"], "inner").select(
        "doc_a", "doc_b", "jaccard"
    )


def simhash_pairs(
    documents: DataFrame, max_hamming: int = 6, nbits: int = 64
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit signature, Hamming distance ≤ k.

    Signature: per word-hash, each bit contributes ±1; the sign of the
    per-bit sum is the signature bit. Computed as 64 conditional-sum
    aggregates in one groupBy (single shuffle). Pairing is a crossJoin +
    ``bit_count(XOR)`` filter — exact at fixture scale; the scale path is
    to prefix-bucket signatures (pigeonhole: split into max_hamming+1
    chunks, join on any equal chunk) before the XOR check.
    """
    words = (
        documents.select(F.col("doc_id"), _norm(F.col("text")).alias("t"))
        .select("doc_id", F.explode(F.split(F.col("t"), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .withColumn("h", F.xxhash64("w"))
    )
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(nbits)
    ]
    per_bit = words.groupBy("doc_id").agg(*bit_aggs)
    sig_expr = None
    for i in range(nbits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sig_expr = term if sig_expr is None else sig_expr.bitwiseOR(term)
    sigs = per_bit.select("doc_id", sig_expr.alias("simhash"))

    a, b = sigs.alias("a"), sigs.alias("b")
    dist = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn("hamming", dist)
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            "hamming",
        )
    )
