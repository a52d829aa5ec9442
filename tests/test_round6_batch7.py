"""Seventh round-6 batch: reshape / integrity / CBO / gapfill / linkage.

Behavioral properties the DuckDB oracles cannot express: checksum
sensitivity + order-independence, equi-depth balance bounds, LOCF
semantics, and a pure-Python brute-force parity for the blocked
edit-distance linkage.
"""

from pyspark.sql import functions as F

from streamlit_projet_spark_streaming_spark.operators.dedup import md5_hash_pieces, _norm
from streamlit_projet_spark_streaming_spark.operators.numeric import cents
from streamlit_projet_spark_streaming_spark.registry import (
    REGISTRY,
    _ED_BLOCK,
    _ED_BLOCK_CAP,
    _ED_MAXDIST,
    _ED_PREFIX,
    _EQUIDEPTH_BINS,
    _EQUIDEPTH_COARSE,
    _RANK_DECILES,
)
from streamlit_projet_spark_streaming_spark.sources.catalog import load_table

from .conftest import SF_SMOKE


def _checksum(spark, rows):
    df = spark.createDataFrame(rows, "k long, s string, v long")
    x1, x2 = md5_hash_pieces(
        F.concat_ws(
            "|",
            F.col("k").cast("string"),
            F.col("s"),
            F.col("v").cast("string"),
        )
    )
    return (
        df.select(x1.alias("x1"), x2.alias("x2"))
        .agg(
            F.sum("x1").alias("s1"),
            F.sum("x2").alias("s2"),
            F.bit_xor("x1").alias("o1"),
            F.bit_xor("x2").alias("o2"),
        )
        .collect()[0]
    )


def test_checksum_order_independent_and_sensitive(spark):
    base = [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    got = _checksum(spark, base)
    perm = _checksum(spark, [base[2], base[0], base[1]])
    assert tuple(got) == tuple(perm), "row order must not affect the checksum"
    mut = _checksum(spark, [(1, "a", 10), (2, "b", 21), (3, "c", 30)])
    assert tuple(got) != tuple(mut), "a single-field mutation must change it"


def test_table_checksum_rowcount(spark):
    row = REGISTRY["orders_table_checksum"].builder(spark, SF_SMOKE).collect()
    assert len(row) == 1
    r = row[0]
    assert r["n_rows"] == load_table(spark, "orders", SF_SMOKE).count()
    assert r["sum_h1"] > 0 and r["sum_h2"] > 0


def test_equidepth_histogram_balance(spark):
    orders = load_table(spark, "orders", SF_SMOKE)
    total = orders.count()
    bins = REGISTRY["price_histogram_equidepth"].builder(spark, SF_SMOKE).collect()
    assert sum(b["n_rows"] for b in bins) == total
    ids = [b["bin"] for b in bins]
    assert ids == sorted(ids) and ids[0] == 1 and ids[-1] <= _EQUIDEPTH_BINS
    # bins tile the value axis without overlap
    for a, b in zip(bins, bins[1:]):
        assert a["hi_cents"] < b["lo_cents"]
    # depth balance up to one coarse bucket's mass (the documented bound)
    max_bucket = (
        orders.groupBy(
            F.floor(cents(F.col("o_totalprice")) / F.lit(_EQUIDEPTH_COARSE))
        )
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    for b in bins:
        assert b["n_rows"] <= total // _EQUIDEPTH_BINS + max_bucket


def test_rank_profile_endpoints(spark):
    rows = (
        REGISTRY["customer_balance_rank_profile"].builder(spark, SF_SMOKE).collect()
    )
    n = len(rows)
    assert [r["rnk"] for r in rows] == list(range(1, n + 1))
    assert rows[0]["pct_rank"] == 0.0 and rows[-1]["pct_rank"] == 1.0
    assert rows[-1]["cume_dist"] == 1.0
    assert rows[0]["decile"] == 1 and rows[-1]["decile"] == _RANK_DECILES
    assert all(a["decile"] <= b["decile"] for a, b in zip(rows, rows[1:]))


def test_gapfill_locf_semantics(spark):
    rows = (
        REGISTRY["events_hourly_gapfill_locf"].builder(spark, SF_SMOKE).collect()
    )
    assert rows, "gapfill produced no grid"
    ids = [r["hour_id"] for r in rows]
    assert ids == list(range(ids[0], ids[0] + len(ids))), "grid must be dense"
    # endpoints are observations by construction of [min, max]
    assert rows[0]["is_gap"] == 0 and rows[-1]["is_gap"] == 0
    last = None
    for r in rows:
        if r["is_gap"]:
            assert r["n_events"] == 0
            assert r["locf_events"] == last
        else:
            assert r["n_events"] > 0 and r["locf_events"] == r["n_events"]
            last = r["n_events"]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_edit_pairs_match_bruteforce(spark):
    docs = (
        load_table(spark, "documents", SF_SMOKE)
        .select("doc_id", _norm(F.col("text")).alias("nt"))
        .collect()
    )
    blocks: dict[str, list] = {}
    for r in docs:
        blocks.setdefault(r["nt"][:_ED_BLOCK], []).append(r)
    want = set()
    for members in blocks.values():
        if not (1 < len(members) <= _ED_BLOCK_CAP):
            continue
        members = sorted(members, key=lambda r: r["doc_id"])
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                d = _lev(a["nt"][:_ED_PREFIX], b["nt"][:_ED_PREFIX])
                if d <= _ED_MAXDIST:
                    want.add((a["doc_id"], b["doc_id"], d))
    got = {
        (r["doc_a"], r["doc_b"], r["edit_dist"])
        for r in REGISTRY["doc_prefix_edit_pairs"].builder(spark, SF_SMOKE).collect()
    }
    assert got == want and want, "blocked linkage must equal brute force"


def test_unpivot_measures_roundtrip(spark):
    rows = (
        REGISTRY["orders_unpivot_measures"].builder(spark, SF_SMOKE).collect()
    )
    statuses = {r["o_orderstatus"] for r in rows}
    assert len(rows) == 3 * len(statuses)
    per = {}
    for r in rows:
        per.setdefault(r["o_orderstatus"], {})[r["measure"]] = r["value"]
    for status, m in per.items():
        assert set(m) == {"n_orders", "total_cents", "max_cents"}
        assert m["n_orders"] > 0 and m["max_cents"] <= m["total_cents"]


def test_join_cardinality_identity(spark):
    """The histogram estimate IS the equi-join cardinality — check it
    against the actually-executed joins."""
    got = {
        r["join_name"]: r
        for r in REGISTRY["join_cardinality_profile"].builder(spark, SF_SMOKE).collect()
    }
    li = load_table(spark, "lineitem", SF_SMOKE)
    orders = load_table(spark, "orders", SF_SMOKE)
    cust = load_table(spark, "customer", SF_SMOKE)
    assert (
        got["lineitem_orders"]["est_rows"]
        == li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    )
    assert (
        got["orders_customer"]["est_rows"]
        == orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    )
    assert got["lineitem_orders"]["max_key_fanout"] >= 1


def test_partition_checksums_cover_table(spark):
    rows = (
        REGISTRY["events_partition_checksums"].builder(spark, SF_SMOKE).collect()
    )
    assert sum(r["n_rows"] for r in rows) == load_table(
        spark, "events", SF_SMOKE
    ).count()
    assert len({r["day_id"] for r in rows}) == len(rows)


def test_inverted_index_invariants(spark):
    rows = REGISTRY["text_inverted_index"].builder(spark, SF_SMOKE).collect()
    assert rows
    dfs = [r["doc_freq"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    for r in rows:
        assert r["total_tf"] >= r["doc_freq"]
        # postings_head crosses as a ' '-joined string (driver-hashable
        # output, r7); parse it back to doc ids for the invariants.
        head = [int(d) for d in r["postings_head"].split(" ")]
        assert head == sorted(head)
        assert len(head) == min(r["doc_freq"], 10)


def test_datacard_invariants(spark):
    rows = REGISTRY["dataset_datacard"].builder(spark, SF_SMOKE).collect()
    docs = load_table(spark, "documents", SF_SMOKE)
    assert sum(r["n_docs"] for r in rows) == docs.count()
    bounds = {
        (r["source"]): (r["mn"], r["mx"])
        for r in docs.groupBy("source")
        .agg(F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx"))
        .collect()
    }
    for r in rows:
        assert 0.0 <= r["dup_rate"] <= 1.0
        assert r["total_tokens"] >= r["n_docs"]
        lo, hi = bounds[r["source"]]
        assert lo <= r["p50_chars"] <= hi


def test_winnowing_matches_python_and_guarantee(spark):
    """Recompute winnowing in pure Python for every smoke doc: n_fp
    matches, and the MOSS guarantee holds — every window of W
    consecutive grams contains a selected fingerprint position."""
    import hashlib

    from streamlit_projet_spark_streaming_spark.registry import (
        _WIN_K,
        _WIN_POS_PACK,
        _WIN_W,
    )

    docs = {
        r["doc_id"]: r["nt"]
        for r in load_table(spark, "documents", SF_SMOKE)
        .select("doc_id", _norm(F.col("text")).alias("nt"))
        .collect()
    }
    got = {
        r["doc_id"]: r
        for r in REGISTRY["text_winnowing_fingerprints"]
        .builder(spark, SF_SMOKE)
        .collect()
    }
    assert set(got) == set(docs)
    for doc_id, nt in docs.items():
        words = nt.split(" ")
        keys = []
        for i in range(len(words) - _WIN_K + 1):
            sh = " ".join(words[i : i + _WIN_K])
            h = int(hashlib.md5(f"win:{sh}".encode()).hexdigest()[:7], 16)
            keys.append(h * _WIN_POS_PACK + (i + 1))
        sel_pos = set()
        for e in range(len(keys)):
            lo = max(0, e - (_WIN_W - 1))
            kmin = min(keys[lo : e + 1])
            sel_pos.add(kmin % _WIN_POS_PACK)
        r = got[doc_id]
        assert r["n_kgrams"] == len(keys)
        assert r["n_fp"] == len(sel_pos)
        # guarantee: every full W-window contains a selected position
        for e in range(_WIN_W - 1, len(keys)):
            win = set(range(e - _WIN_W + 2, e + 2))  # 1-based positions
            assert win & sel_pos, f"doc {doc_id}: window ending {e} uncovered"


def test_dedup_weights_consistent(spark):
    from fractions import Fraction

    rows = (
        REGISTRY["dedup_aware_sample_weights"].builder(spark, SF_SMOKE).collect()
    )
    assert len(rows) == load_table(spark, "documents", SF_SMOKE).count()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert any(len(v) > 1 for v in by_cluster.values()), "no clusters found"
    for cid, members in by_cluster.items():
        den = len(members)
        # weight is the half-away rounded 1/size at 4 decimals
        want = (1 * 20000 + den) // (2 * den) / 10000
        assert want == round(float(Fraction(1, den)), 4) or den % 2 == 0
        for m in members:
            assert m["cluster_size"] == den
            assert m["weight"] == want


def test_referential_integrity_consistent(spark):
    from streamlit_projet_spark_streaming_spark.registry import _RI_RELATIONS

    rows = {
        r["relation"]: r
        for r in REGISTRY["referential_integrity_audit"]
        .builder(spark, SF_SMOKE)
        .collect()
    }
    assert set(rows) == {rel for rel, *_ in _RI_RELATIONS}
    for rel, child, ck, parent, pk in _RI_RELATIONS:
        r = rows[rel]
        assert r["child_rows"] == load_table(spark, child, SF_SMOKE).count()
        assert r["orphan_keys"] <= r["child_keys"]
        assert r["orphan_rows"] >= r["orphan_keys"] or r["orphan_rows"] == 0
        # the synthetic star schema is referentially intact
        assert r["orphan_rows"] == 0 and r["null_rows"] == 0


def test_psi_terms_nonnegative(spark):
    """Every PSI term (p-q)ln(p/q) is >= 0 — sign-shared factors — and
    the reported psi is exactly the unit sum."""
    rows = REGISTRY["embedding_psi_drift"].builder(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["term_units"] >= 0
    psi = rows[0]["psi"]
    assert all(r["psi"] == psi for r in rows)
    assert psi == sum(r["term_units"] for r in rows) / 1e6


def test_theilsen_matches_python(spark):
    from fractions import Fraction

    from streamlit_projet_spark_streaming_spark.registry import _THEILSEN_DAYS

    all_days = sorted(
        (r["d"], r["y"])
        for r in load_table(spark, "orders", SF_SMOKE)
        .groupBy(
            F.floor(F.unix_millis("o_orderdate") / F.lit(86400000))
            .cast("long")
            .alias("d")
        )
        .agg(
            F.round(F.round(F.sum("o_totalprice"), 2) * 100)
            .cast("long")
            .alias("y")
        )
        .collect()
    )
    dm = max(d for d, _ in all_days)
    days = [(d, y) for d, y in all_days if d > dm - _THEILSEN_DAYS]
    slopes = sorted(
        (Fraction(yb - ya, db - da), yb - ya, db - da)
        for i, (da, ya) in enumerate(days)
        for db, yb in days[i + 1 :]
    )
    med = slopes[(len(slopes) + 1) // 2 - 1]
    got = REGISTRY["orders_theilsen_trend"].builder(spark, SF_SMOKE).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_pairs"] == len(slopes)
    assert Fraction(r["med_num_cents"], r["med_den_days"]) == med[0]


def test_winsorized_matches_python(spark):
    from fractions import Fraction

    from streamlit_projet_spark_streaming_spark.registry import _WINSOR_HI, _WINSOR_LO

    vals = sorted(
        r["c"]
        for r in load_table(spark, "orders", SF_SMOKE)
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c")
        )
        .collect()
    )
    n = len(vals)
    lo = vals[(_WINSOR_LO * n + 99) // 100 - 1]
    hi = vals[(_WINSOR_HI * n + 99) // 100 - 1]
    clamped = [min(max(v, lo), hi) for v in vals]
    want_mean = Fraction(sum(clamped), n * 100)
    got = REGISTRY["orders_winsorized_stats"].builder(spark, SF_SMOKE).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n_orders"], r["lo_cents"], r["hi_cents"]) == (n, lo, hi)
    assert r["n_at_floor"] == sum(1 for v in clamped if v == lo)
    assert r["n_at_cap"] == sum(1 for v in clamped if v == hi)
    num, den = want_mean.numerator, want_mean.denominator
    assert r["winsorized_mean"] == (
        (-1 if num < 0 else 1)
        * ((abs(num) * 20000 + den) // (2 * den))
        / 10000
    )


def test_mmr_rerank_matches_python(spark):
    """Greedy MMR re-implemented in pure Python over the same rounded
    cosine inputs must reproduce the operator's picks exactly."""
    import numpy as np

    from streamlit_projet_spark_streaming_spark.registry import (
        _MMR_CAND,
        _MMR_K,
        _MMR_LAM_DEN,
        _MMR_LAM_NUM,
    )

    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load_table(spark, "embeddings", SF_SMOKE).collect()
    }

    def u4(a, b):
        """cosine in exact 1e-4 integer units (matches the operator)."""
        va, vb = emb[a], emb[b]
        return round(
            round(float(va @ vb) / (np.sqrt(va @ va) * np.sqrt(vb @ vb)), 4)
            * 10000
        )

    got = (
        REGISTRY["retrieval_mmr_rerank"].builder(spark, SF_SMOKE).collect()
    )
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(10))
    bnum = _MMR_LAM_DEN - _MMR_LAM_NUM
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["pick"])
        cands = sorted(
            (v for v in emb if v != q),
            key=lambda v: (-u4(q, v), v),
        )[:_MMR_CAND]
        sel = [cands[0]]
        units = [u4(q, cands[0]) * _MMR_LAM_NUM]
        while len(sel) < _MMR_K:
            best = max(
                (v for v in cands if v not in sel),
                key=lambda v: (
                    _MMR_LAM_NUM * u4(q, v)
                    - bnum * max(u4(v, s) for s in sel),
                    -v,
                ),
            )
            units.append(
                _MMR_LAM_NUM * u4(q, best)
                - bnum * max(u4(best, s) for s in sel)
            )
            sel.append(best)
        assert [r["neighbor_id"] for r in rows] == sel, f"query {q}"
        assert [r["score_units"] for r in rows] == units, f"query {q} units"


def test_threshold_sweep_monotone(spark):
    rows = (
        REGISTRY["dedup_threshold_sweep"].builder(spark, SF_SMOKE).collect()
    )
    assert len(rows) == 5
    pair_counts = [r["n_pairs"] for r in rows]
    doc_counts = [r["n_docs"] for r in rows]
    assert pair_counts == sorted(pair_counts, reverse=True)
    assert doc_counts == sorted(doc_counts, reverse=True)
    for r in rows:
        assert r["n_docs"] <= 2 * r["n_pairs"]


def test_seasonal_decompose_identity(spark):
    """trend + seasonal + residual reconstructs the series exactly
    before rounding — post-rounding within 2 grid steps — and the
    trend is the true centered-window mean."""
    rows = (
        REGISTRY["events_seasonal_decompose"].builder(spark, SF_SMOKE).collect()
    )
    assert rows
    for r in rows:
        recon = r["trend"] + r["seasonal"] + r["residual"]
        assert abs(recon - r["n_events"]) <= 3e-4, r


def test_winnowing_recall_on_strong_pairs(spark):
    """The MOSS guarantee, empirically: every exact near-dup pair at
    jaccard >= 0.9 (long shared runs) shares >= 1 selected
    fingerprint."""
    rows = (
        REGISTRY["winnowing_recall_audit"].builder(spark, SF_SMOKE).collect()
    )
    strong = [r for r in rows if r["jaccard"] >= 0.9]
    assert strong, "fixture should contain strong near-dup pairs"
    for r in strong:
        assert r["shared_fp"] >= 1, r
