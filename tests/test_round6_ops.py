"""Round-6 continuation ops: PCA spectrum numpy parity."""

import numpy as np

from streamlit_projet_spark_streaming_spark.operators.similarity import pca_spectrum
from streamlit_projet_spark_streaming_spark.sources.catalog import load_table

from .conftest import SF_SMOKE


def test_pca_spectrum_matches_numpy(spark):
    emb = load_table(spark, "embeddings", SF_SMOKE)
    got = pca_spectrum(emb, top_k=10).collect()

    x = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()]
    )
    q = np.floor(x * 1e6)
    n, d = q.shape
    cov = (n * (q.T @ q) - np.outer(q.sum(0), q.sum(0))) / (n * n) * 1e-12
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    total = evals.sum()

    assert [r["component"] for r in got] == list(range(1, 11))
    for r in got:
        ev = evals[r["component"] - 1]
        assert abs(r["eigenvalue"] - ev) < 1e-6 + 1e-6 * abs(ev)
        assert abs(r["explained_ratio"] - ev / total) < 1e-3
    # ratios sum to ≤ 1 and the cum column is the running sum
    cums = np.cumsum([evals[i] / total for i in range(10)])
    for r, c in zip(got, cums):
        assert abs(r["cum_explained_ratio"] - c) < 1e-3


def test_pca_spectrum_planted_anisotropy(spark):
    """A corpus with variance concentrated on one axis puts ~all
    explained variance in component 1."""
    rng = np.random.default_rng(7)
    base = rng.normal(0, 0.01, size=(200, 8))
    base[:, 3] += rng.normal(0, 10.0, size=200)
    rows = [(i, [float(v) for v in base[i]], 0) for i in range(200)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = pca_spectrum(df, top_k=3).collect()
    assert got[0]["explained_ratio"] > 0.99
