"""Property-based check of ``text.remove_dup_spans`` against a pure-Python
reference: random small corpora over a tiny vocabulary (to force span
collisions), the reference recomputes duplicated-span coverage and ordered
reassembly independently — catching boundary arithmetic (span width,
1-based positions, overlap unions) that fixed fixtures can't."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from streamlit_projet_spark_streaming_spark.operators.text import remove_dup_spans

N = 5
VOCAB = ["a", "b", "c", "d", "e"]

_corpus = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=14),
    min_size=1,
    max_size=6,
)


def _reference(docs: list[list[str]]) -> dict[int, tuple[int, int, str]]:
    """(n_words, n_removed, cleaned_text) per doc_id, straight from the
    operator's spec: a word is removed iff covered by an N-gram present
    in >= 2 documents."""
    span_docs: dict[tuple[str, ...], set[int]] = {}
    for did, words in enumerate(docs):
        for i in range(len(words) - N + 1):
            span_docs.setdefault(tuple(words[i : i + N]), set()).add(did)
    out = {}
    for did, words in enumerate(docs):
        covered = set()
        for i in range(len(words) - N + 1):
            if len(span_docs[tuple(words[i : i + N])]) > 1:
                covered.update(range(i, i + N))
        kept = [w for j, w in enumerate(words) if j not in covered]
        out[did] = (len(words), len(words) - len(kept), " ".join(kept))
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_corpus)
def test_remove_dup_spans_matches_reference(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_removed"], r["cleaned_text"])
        for r in remove_dup_spans(df).collect()
    }
    expected = _reference(docs)
    # empty docs: _norm('') splits to [''] -> n_words 1 with an empty word;
    # the reference counts 0. Compare only the semantic fields for those.
    for did, (n_words, n_removed, cleaned) in expected.items():
        g = got[did]
        assert g[2] == cleaned, f"doc {did}: {g[2]!r} != {cleaned!r}"
        assert g[1] == n_removed
        if n_words > 0:
            assert g[0] == n_words
