"""Property-based check of asof_join: against randomly generated event
sets (duplicate timestamps, unmatched keys, boundary-equal timestamps,
NULL keys, NULL payload fields), the union+window formulation must equal
the per-row brute-force definition — including row-atomic payloads (a
NULL field in the matched right row must NOT backfill from older rows)
and equi-join NULL-key semantics."""

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from streamlit_projet_spark_streaming_spark.operators.relational import asof_join

T0 = datetime(2024, 1, 1)

_key = st.one_of(st.none(), st.integers(0, 3))
_left_rows = st.lists(
    st.tuples(_key, st.integers(0, 20)),  # key, ts offset (minutes)
    min_size=1,
    max_size=12,
)
# NOTE: the tiebreak id is assigned by ENUMERATION in the test body, not
# drawn here — asof_join's determinism contract requires (key, ts,
# tiebreak) to be unique on the right side; a drawn id can collide, and
# among fully identical sort keys ANY row may win (hypothesis found
# exactly that: two rows (k=1, ts=0, rid=0) with payloads None and 0.0).
_right_rows = st.lists(
    st.tuples(
        _key,
        st.integers(0, 20),  # ts offset
        st.one_of(st.none(), st.floats(0, 100, allow_nan=False)),  # payload
    ),
    min_size=0,
    max_size=12,
)

LEFT_SCHEMA = StructType(
    [
        StructField("k", LongType(), True),
        StructField("ts", TimestampType(), False),
        StructField("lid", LongType(), False),
    ]
)
RIGHT_SCHEMA = StructType(
    [
        StructField("k", LongType(), True),
        StructField("ts", TimestampType(), False),
        StructField("rid", LongType(), False),
        StructField("rv", DoubleType(), True),
    ]
)


def _brute_force(left, right):
    out = {}
    for k, lts, lid in left:
        if k is None:
            out[lid] = (None, None)
            continue
        matches = [
            (rts, rid, rv)
            for rk, rts, rid, rv in right
            if rk == k and rts <= lts
        ]
        if matches:
            _, rid, rv = max(matches, key=lambda m: (m[0], m[1]))
            out[lid] = (rid, rv)
        else:
            out[lid] = (None, None)
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_left_rows, _right_rows)
def test_asof_join_matches_brute_force(spark, lrows, rrows):
    left = [(k, T0 + timedelta(minutes=m), i) for i, (k, m) in enumerate(lrows)]
    right = [
        (k, T0 + timedelta(minutes=m), rid, rv)
        for rid, (k, m, rv) in enumerate(rrows)
    ]
    ldf = spark.createDataFrame(left, LEFT_SCHEMA)
    rdf = spark.createDataFrame(right, RIGHT_SCHEMA)
    got = {
        r.lid: (r.rid, r.rv)
        for r in asof_join(
            ldf, rdf, on="k", left_ts="ts", right_ts="ts",
            right_vals=["rid", "rv"], tiebreak="rid",
        ).collect()
    }
    expect = _brute_force(left, right)
    assert got == expect


def test_asof_join_drops_null_right_timestamps(spark):
    """A right row with a NULL timestamp must never match: at-or-before is
    a comparison against the timestamp, and NULL compares to nothing.
    Without the right-side ts filter, asc-nulls-first ordering would sort
    the NULL-ts row before everything in its key partition and carry it
    forward as a phantom match."""
    nullable_right = StructType(
        [
            StructField("k", LongType(), True),
            StructField("ts", TimestampType(), True),
            StructField("rid", LongType(), False),
            StructField("rv", DoubleType(), True),
        ]
    )
    ldf = spark.createDataFrame([(1, T0 + timedelta(minutes=5), 0)], LEFT_SCHEMA)
    rdf = spark.createDataFrame(
        [(1, None, 100, 1.0), (1, T0 + timedelta(minutes=1), 7, 2.0)],
        nullable_right,
    )
    got = {
        r.lid: (r.rid, r.rv)
        for r in asof_join(
            ldf, rdf, on="k", left_ts="ts", right_ts="ts",
            right_vals=["rid", "rv"], tiebreak="rid",
        ).collect()
    }
    # the NULL-ts rid=100 row is ignored; the real at-or-before row wins
    assert got == {0: (7, 2.0)}

    only_null = spark.createDataFrame([(1, None, 100, 1.0)], nullable_right)
    got_none = asof_join(
        ldf, only_null, on="k", left_ts="ts", right_ts="ts",
        right_vals=["rid", "rv"], tiebreak="rid",
    ).collect()
    assert [(r.rid, r.rv) for r in got_none] == [(None, None)]
