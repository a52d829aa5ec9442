"""Fixture-encoding contract for ``sources.catalog.load_table``.

The driver regenerated the parquet fixtures between rounds 3 and 4,
silently changing ``events.ts`` from parquet TIMESTAMP(NANOS) to
``timestamp[us]`` without timezone (→ Spark ``TIMESTAMP_NTZ``), which broke
every ``unix_micros``/``unix_millis`` consumer. This test writes the events
schema in all three encodings seen so far — ns-long, µs-NTZ, µs-LTZ — and
asserts ``load_table`` normalizes each to microsecond ``TimestampType``
with identical instants, so a future re-encoding can't break the engine
twice.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from streamlit_projet_spark_streaming_spark.sources.catalog import load_table
from pyspark.sql.types import TimestampType

# Two instants with sub-second precision, as µs since epoch (UTC).
T0_US = 1_700_000_000_123_456
T1_US = 1_700_003_600_654_321
EXPECTED = [
    dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us)
    for us in (T0_US, T1_US)
]


def _events_batch(ts_array: pa.Array) -> pa.Table:
    return pa.table(
        {
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 11], type=pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([1.5, 2.5], type=pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )


ENCODINGS = {
    # round-1..3 fixtures: TIMESTAMP(NANOS) — Spark has no native type,
    # read as ns longs via spark.sql.legacy.parquet.nanosAsLong
    "ns_no_tz": pa.array(
        [T0_US * 1000, T1_US * 1000], type=pa.timestamp("ns")
    ),
    # round-4 fixtures: timestamp[us] without tz → Spark TIMESTAMP_NTZ
    "us_no_tz": pa.array([T0_US, T1_US], type=pa.timestamp("us")),
    # plain µs with UTC tz → Spark TimestampType directly
    "us_utc": pa.array([T0_US, T1_US], type=pa.timestamp("us", tz="UTC")),
}


@pytest.mark.parametrize("encoding", sorted(ENCODINGS))
def test_load_table_normalizes_ts_encoding(spark, tmp_path, encoding):
    sf_dir = str(tmp_path / encoding)
    os.makedirs(sf_dir)
    pq.write_table(
        _events_batch(ENCODINGS[encoding]),
        os.path.join(sf_dir, "events.parquet"),
    )

    df = load_table(spark, "events", sf_dir)
    assert isinstance(df.schema["ts"].dataType, TimestampType), (
        f"{encoding}: ts read as {df.schema['ts'].dataType}"
    )
    rows = df.orderBy("event_id").select("ts").collect()
    # Session tz is UTC, so naive datetimes from collect() are UTC instants.
    got = [r["ts"].replace(tzinfo=None) for r in rows]
    assert got == EXPECTED, f"{encoding}: {got} != {EXPECTED}"


def test_non_events_table_ns_long_also_normalizes(spark, tmp_path):
    """The r1-r3 fixtures used TIMESTAMP(NANOS) for orders/lineitem dates
    too — the ns-long branch must cover every TS_COLS column, not just
    events.ts (the round-4 breakage was exactly a column the special-case
    missed)."""
    sf_dir = str(tmp_path / "orders_ns")
    os.makedirs(sf_dir)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2], type=pa.int64()),
                "o_custkey": pa.array([7, 8], type=pa.int64()),
                "o_orderstatus": pa.array(["F", "O"]),
                "o_totalprice": pa.array([10.5, 20.5], type=pa.float64()),
                "o_orderdate": pa.array(
                    [T0_US * 1000, T1_US * 1000], type=pa.timestamp("ns")
                ),
                "o_orderpriority": pa.array(["1-URGENT", "2-HIGH"]),
            }
        ),
        os.path.join(sf_dir, "orders.parquet"),
    )
    df = load_table(spark, "orders", sf_dir)
    assert isinstance(df.schema["o_orderdate"].dataType, TimestampType)
    got = [
        r["o_orderdate"].replace(tzinfo=None)
        for r in df.orderBy("o_orderkey").select("o_orderdate").collect()
    ]
    assert got == EXPECTED


def test_real_fixture_ts_columns_are_timestamp(spark):
    """Whatever today's driver encoding is, every known timestamp column
    must come out of load_table as TimestampType."""
    from tests.conftest import SF_CORRECT

    for table, col in (("events", "ts"), ("orders", "o_orderdate"),
                       ("lineitem", "l_shipdate")):
        df = load_table(spark, table, SF_CORRECT)
        assert isinstance(df.schema[col].dataType, TimestampType), (
            f"{table}.{col} is {df.schema[col].dataType}"
        )


def test_ntz_cast_correct_under_non_utc_session_tz(spark, tmp_path):
    """load_table must self-set the UTC session timezone (ADVICE r5): a
    driver session on a non-UTC host would otherwise silently shift every
    NTZ instant during the TimestampType cast and fail all timestamp
    oracles."""
    sf_dir = str(tmp_path / "tz_probe")
    os.makedirs(sf_dir)
    pq.write_table(
        _events_batch(ENCODINGS["us_no_tz"]),
        os.path.join(sf_dir, "events.parquet"),
    )
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = load_table(spark, "events", sf_dir)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        got = [
            r["us"]
            for r in df.selectExpr("unix_micros(ts) AS us")
            .orderBy("us")
            .collect()
        ]
        assert got == [T0_US, T1_US], got
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_table_cols_match_fixture_schemas():
    """Pin registry._TABLE_COLS (the generated boundary subqueries'
    explicit projections) to the actual fixture parquet schemas: if a
    regeneration adds/reorders columns, load_table's SELECT * would
    pick them up on the Spark side while the oracle subqueries kept
    projecting the stale list — this is the pin the r8 review found
    missing."""
    import pyarrow.parquet as pq_mod

    from streamlit_projet_spark_streaming_spark.registry import _TABLE_COLS

    from tests.conftest import SF_SMOKE

    for table, cols in _TABLE_COLS.items():
        path = os.path.join(SF_SMOKE, f"{table}.parquet")
        names = tuple(pq_mod.read_schema(path).names)
        assert names == cols, (
            f"{table}: fixture schema {names} != registry._TABLE_COLS "
            f"{cols} — update the catalog policy dicts and re-sweep"
        )
