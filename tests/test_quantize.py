"""Semantics tests for embedding quantization (operators/quantize.py):
properties the DuckDB oracle can't express — reconstruction error bounds,
code ranges, and PQ distortion optimality."""

import numpy as np
import pytest

from streamlit_projet_spark_streaming_spark.operators import quantize
from streamlit_projet_spark_streaming_spark.sources.catalog import load_table

from .conftest import SF_CORRECT


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, "embeddings", SF_CORRECT)


def test_quantize_codes_range_and_roundtrip(spark, emb):
    stats = {
        r["dim"]: (r["mn"], r["mx"])
        for r in quantize.dim_stats(emb).collect()
    }
    out = quantize.quantize_embeddings(emb).collect()
    raw = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    assert len(out) == len(raw)
    for row in out:
        codes = np.asarray(row["codes"])
        x = np.asarray(raw[row["vec_id"]], dtype=np.float64)
        assert codes.min() >= 0 and codes.max() <= 255
        assert len(codes) == len(x)
        # Dequantized midpoint is within one quantization step of x.
        for d, (c, xv) in enumerate(zip(codes, x)):
            mn, mx = stats[d]
            step = (mx - mn) / 255.0
            assert mn + c * step <= xv + 1e-12
            assert xv <= mn + (c + 1) * step + 1e-12


def test_pq_distortion_is_min_over_codebook(spark, emb):
    """The chosen centroid per subspace achieves the minimal exact integer
    distance — recompute distances in numpy from the quantized codes and
    the deterministic md5-anchor codebook."""
    codes = {
        r["vec_id"]: np.asarray(r["codes"], dtype=np.int64)
        for r in quantize.quantize_embeddings(emb).collect()
    }
    import hashlib

    anchors = sorted(
        codes, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )[:16]
    cb = np.stack([codes[v] for v in anchors])
    out = quantize.pq_codes(emb).collect()
    assert len(out) == len(codes)
    for row in out[:100]:
        x = codes[row["vec_id"]]
        d2 = ((x[None, :] - cb) ** 2).reshape(16, 8, 8).sum(axis=2)  # (J, M)
        best = d2.min(axis=0)
        chosen = np.asarray(row["pq_codes"])
        assert len(chosen) == 8
        got = d2[chosen, np.arange(8)]
        assert (got == best).all(), "non-minimal centroid chosen"
        # Tie-break: the chosen index is the SMALLEST achieving the min.
        for m in range(8):
            assert chosen[m] == int(np.argmin(d2[:, m]))
        assert row["distortion"] == int(best.sum())


def test_quantize_constant_dimension_is_zero(spark):
    df = spark.createDataFrame(
        [(1, [0.5, 1.0]), (2, [0.5, 2.0])], "vec_id long, embedding array<float>"
    )
    out = {r["vec_id"]: r["codes"] for r in quantize.quantize_embeddings(df).collect()}
    assert out[1][0] == 0 and out[2][0] == 0  # constant dim -> code 0
    assert out[1][1] == 0 and out[2][1] == 255  # min/max of the live dim
