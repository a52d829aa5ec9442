"""Invariant tests for the non-oracle (rows-only) dedup operators:
LSH candidates must be a subset of the exact pairs and recall high."""

from streamlit_projet_spark_streaming_spark.operators import dedup
from streamlit_projet_spark_streaming_spark.sources.catalog import load_table

from .conftest import SF_CORRECT


def test_minhash_lsh_subset_and_recall(spark):
    docs = load_table(spark, "documents", SF_CORRECT)
    exact = {
        (r.doc_a, r.doc_b) for r in dedup.ngram_jaccard_pairs(docs, 5, 0.6).collect()
    }
    lsh = {(r.doc_a, r.doc_b) for r in dedup.minhash_lsh_pairs(docs).collect()}
    assert lsh <= exact, f"LSH produced non-exact pairs: {lsh - exact}"
    if exact:
        recall = len(lsh) / len(exact)
        assert recall >= 0.8, f"LSH recall too low: {recall:.2f} ({len(lsh)}/{len(exact)})"


def test_simhash_finds_near_dups(spark):
    docs = load_table(spark, "documents", SF_CORRECT)
    pairs = dedup.simhash_pairs(docs, max_hamming=6).collect()
    # signatures are 64-bit; pairs at hamming<=6 should be few and plausible
    for r in pairs:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= 6
