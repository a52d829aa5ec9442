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


def shingles(documents: DataFrame, n: int = 3, unit: str = "word") -> DataFrame:
    """Distinct n-gram shingle set per document. Output: (doc_id, sh).

    ``unit="word"`` (default): word n-grams — the standard dedup shingle.
    Discriminative even over small vocabularies (universe = vocab^n), which
    keeps the similarity-join pair graph sparse; char-grams over a small
    vocab make *every* shingle hot and the join quadratic.
    ``unit="char"``: character n-grams (substring windows).

    Both are ``sequence`` + explode + builtin expressions, pipelined into
    the scan.
    """
    norm = documents.select(F.col("doc_id"), _norm(F.col("text")).alias("t"))
    if unit == "char":
        return (
            norm.filter(F.length("t") >= n)
            .select(
                "doc_id",
                F.explode(F.sequence(F.lit(1), F.length("t") - (n - 1))).alias("i"),
                "t",
            )
            .select("doc_id", F.expr(f"substring(t, i, {n})").alias("sh"))
            .distinct()
        )
    gram = ", ".join(f"element_at(w, i + {j})" for j in range(n))
    return (
        norm.select("doc_id", F.split(F.col("t"), " ").alias("w"))
        .filter(F.size("w") >= n)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("w") - (n - 1))).alias("i"),
            "w",
        )
        .select("doc_id", F.expr(f"concat_ws(' ', {gram})").alias("sh"))
        .distinct()
    )


def ngram_jaccard_pairs(
    documents: DataFrame, n: int = 3, threshold: float = 0.6, unit: str = "word"
) -> DataFrame:
    """EXACT n-gram Jaccard near-duplicate pairs (doc_a < doc_b, J ≥ τ),
    via prefix filtering (AllPairs/PPJoin family) — same result set as the
    naive all-shingle self-join, radically cheaper.

    Filters (both are lossless for J ≥ τ):
    - **Prefix filter**: order each doc's shingles by global rarity
      (document frequency asc, shingle asc). If J(A,B) ≥ τ, then with the
      length filter below the overlap is ≥ ⌈τ·|A|⌉, so A and B must share
      at least one shingle among each one's first |X| − ⌈τ·|X|⌉ + 1
      shingles (pigeonhole). Candidates come from a prefix×prefix join —
      hot shingles (high df) land at the END of the order and mostly drop
      out of candidate generation, which is what kills the quadratic
      blowup of the naive join.
    - **Length filter**: τ·|A| ≤ |B| ≤ |A|/τ.

    Verification computes J only for candidates (``jaccard_for_pairs``).

    Scale: candidate generation shuffles on prefix shingles (rare by
    construction → uniform buckets); verification is linear in candidate
    count. At 100 TB pair the corpus down first with ``minhash_lsh_pairs``
    or raise τ; the semantics stay identical.
    """
    from pyspark.sql import Window

    sh = shingles(documents, n, unit)
    docfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    ranked = sh.join(docfreq, "sh")
    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("sh"))
    wcnt = Window.partitionBy("doc_id")
    prefix = (
        ranked.withColumn("pos", F.row_number().over(w))
        .withColumn("n_sh", F.count(F.lit(1)).over(wcnt))
        # floor (not ceil) keeps the prefix conservatively LONG under float
        # rounding of τ·n — never drops a true pair, only admits extras
        .filter(
            F.col("pos")
            <= F.col("n_sh") - F.floor(F.lit(threshold) * F.col("n_sh")) + 1
        )
        .select("doc_id", "sh", "n_sh")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter: τ|A| ≤ |B| ≤ |A|/τ
            & (F.col("b.n_sh") >= threshold * F.col("a.n_sh"))
            & (F.col("b.n_sh") * threshold <= F.col("a.n_sh")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return jaccard_for_pairs(candidates, sh, threshold)


def minhash_signatures(documents: DataFrame, n: int = 3, num_hashes: int = 32, unit: str = "word") -> DataFrame:
    """MinHash signature per document: sig[i] = min over shingles of
    xxhash64(i, shingle).

    One groupBy computes all ``num_hashes`` minima as parallel aggregates —
    a single shuffle regardless of signature width.
    """
    sh = shingles(documents, n, unit)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    documents: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.6,
    unit: str = "word",
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
    sig = minhash_signatures(documents, n, num_hashes, unit)
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
    # exact verification on CANDIDATES ONLY — this is the whole point of
    # LSH: the quadratic Jaccard join never runs on non-candidate pairs.
    sh = shingles(documents, n, unit)
    return jaccard_for_pairs(candidates, sh, threshold)


def jaccard_for_pairs(
    pairs: DataFrame, sh: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard computed only for the given (doc_a, doc_b) pairs.

    Cost: |pairs| × avg shingle count — linear in candidates, never in
    corpus². Join order: expand pairs by doc_a's shingles, then equi-join
    on (doc_b, shingle) to count the intersection.
    """
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a_sh = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b_sh = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        pairs.join(a_sh, "doc_a")
        .join(b_sh, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
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
