"""Bitwise (sub-canonical) value audit: every entry at FULL precision.

The driver's canonical compare rounds floats to 4 decimals, so an
engine/oracle pair can be "green" while their doubles disagree below
the threshold — slack that a different canonicalizer, a different
DuckDB build, or a future precision change would expose. This audit
re-compares every registry entry with cells formatted at 10
SIGNIFICANT digits (``%.10g`` — far below any ROUND(x,4)/ROUND(x,6)
surface's grid, well above double noise): a pass means engine and
oracle values are bit-identical for practical purposes, not merely
grid-identical, so the output survives ANY reasonable canonicalizer.

First sweep (r8, sf0.01): ALL 294 BITWISE-OK — zero entries with
sub-canonical slack, the direct consequence of the decimal-grid /
integer-unit / IEEE-exact-operator discipline.

Run:  python tools/bitwise_audit.py [sf_dir] [entry ...]
Exit 0 = all bitwise-identical.
"""

from __future__ import annotations

import math
import sys
from collections import Counter

DIGITS = 10


def _cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        if v == 0:
            v = 0.0  # -0.0 → 0.0
        return f"{v:.{DIGITS}g}"
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            v = v.tolist()
        elif isinstance(v, np.generic):
            return _cell(v.item())
    except ImportError:
        pass
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def strict_rows(pdf) -> Counter:
    return Counter(
        tuple(_cell(v) for _, v in sorted(r.items()))
        for r in pdf.to_dict("records")
    )


def main() -> int:
    sys.path.insert(0, "/root/repo")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .appName("bitwise_audit")
        .getOrCreate()
    )

    import __spark_entry__ as e
    from tests.oracle_harness import duckdb_conn

    qs, oracles = e.queries(), e.oracle_sql()
    if only:
        unknown = only - set(qs)
        if unknown:
            # a typo'd entry name must not yield a zero-audit false green
            print(f"unknown entries: {sorted(unknown)}")
            return 2
        qs = {k: v for k, v in qs.items() if k in only}
    con = duckdb_conn(sf_dir)
    bad = []
    for i, (name, fn) in enumerate(qs.items(), 1):
        try:
            a = strict_rows(fn(spark, sf_dir).toPandas())
            b = strict_rows(con.execute(oracles[name]).fetchdf())
            if a != b:
                d = list((a - b).items())[:1] + list((b - a).items())[:1]
                bad.append(name)
                print(f"SLACK {name}: {d}", flush=True)
            else:
                print(f"[{i}] BITWISE-OK {name}", flush=True)
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            bad.append(name)
            print(f"SLACK {name}: audit error {type(ex).__name__}: {ex}",
                  flush=True)
    print(f"\n{len(qs)} entries, {len(bad)} with sub-canonical slack")
    if bad:
        print("SLACK:", bad)
        return 1
    print("RESULT: ALL BITWISE-IDENTICAL")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
