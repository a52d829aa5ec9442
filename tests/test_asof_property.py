"""Property-based check of asof_join: against randomly generated event
sets (duplicate timestamps, unmatched keys, boundary-equal timestamps
included), the union+window formulation must equal the per-row
brute-force definition."""

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from streamlit_projet_spark_streaming_spark.operators.relational import asof_join

T0 = datetime(2024, 1, 1)

_left_rows = st.lists(
    st.tuples(
        st.integers(0, 3),  # key
        st.integers(0, 20),  # ts offset (minutes)
    ),
    min_size=1,
    max_size=12,
)
_right_rows = st.lists(
    st.tuples(
        st.integers(0, 3),  # key
        st.integers(0, 20),  # ts offset
        st.integers(0, 999),  # payload/tiebreak id
    ),
    min_size=0,
    max_size=12,
)

LEFT_SCHEMA = StructType(
    [
        StructField("k", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("lid", LongType(), False),
    ]
)
RIGHT_SCHEMA = StructType(
    [
        StructField("k", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("rid", LongType(), False),
    ]
)


def _brute_force(left, right):
    out = {}
    for k, lts, lid in left:
        matches = [(rts, rid) for rk, rts, rid in right if rk == k and rts <= lts]
        out[lid] = max(matches)[1] if matches else None
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_left_rows, _right_rows)
def test_asof_join_matches_brute_force(spark, lrows, rrows):
    left = [(k, T0 + timedelta(minutes=m), i) for i, (k, m) in enumerate(lrows)]
    right = [(k, T0 + timedelta(minutes=m), rid) for (k, m, rid) in rrows]
    ldf = spark.createDataFrame(left, LEFT_SCHEMA)
    rdf = spark.createDataFrame(right, RIGHT_SCHEMA)
    got = {
        r.lid: r.rid
        for r in asof_join(
            ldf, rdf, on="k", left_ts="ts", right_ts="ts",
            right_vals=["rid"], tiebreak="rid",
        ).collect()
    }
    expect = _brute_force(
        [(k, ts, lid) for k, ts, lid in left],
        [(k, ts, rid) for k, ts, rid in right],
    )
    assert got == expect
