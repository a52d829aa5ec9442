"""DuckDB execution-shape invariance audit for every oracle.

The Spark side's partition/batch-shape invariance is swept by
tools/partition_audit.py. This tool probes the SAME hazard class on the
ORACLE side: DuckDB parallelizes aggregation across threads and morsels,
so a double SUM/AVG/corr is evaluated in a host-dependent order — float
addition is non-associative, and the driver host's core count is not
ours. An oracle whose canonicalized output changes with DuckDB's thread
count would be a driver red that every same-shape local sweep misses.

Method: run every registry oracle under three engine shapes and require
the canonicalized multiset (tests/oracle_harness.canonical_rows — the
driver's own hash surface) to be identical:

  A. threads=1, preserve_insertion_order=true   (serial, stable scan order)
  B. threads=<all cores>, preserve_insertion_order=false (max reordering)
  C. threads=3, preserve_insertion_order=false  (odd morsel split)

Any flip means a hashed double aggregate sits within summation-order
noise of a ROUND half-grid or rank boundary; fix by moving the surface
onto the decimal grid (stable_avg / DECIMAL sums / integer units — the
CLAUDE.md half-grid rules).

Run:  python tools/duckdb_shape_audit.py [sf_dir] [entry ...]
Exit 0 = all invariant. Fast subset pinned by
tests/test_duckdb_shape_invariance.py.
"""

from __future__ import annotations

import os
import sys

SHAPES = (
    ("serial", {"threads": 1, "preserve_insertion_order": True}),
    # pinned to >=8 so a low-core host can't quietly degenerate "wide"
    # into the serial shape (ADVICE r8) — the sweep exists to contrast
    # summation orders, which needs real thread parallelism
    ("wide", {"threads": max(os.cpu_count() or 8, 8), "preserve_insertion_order": False}),
    ("odd", {"threads": 3, "preserve_insertion_order": False}),
)


def shaped_conn(sf_dir: str, config: dict):
    from tests.oracle_harness import duckdb_conn

    return duckdb_conn(sf_dir, config=config)


def audit_entry(cons, sql: str) -> list[str]:
    from tests.oracle_harness import canonical_rows

    results = {}
    for shape_name, con in cons:
        results[shape_name] = canonical_rows(con.execute(sql).fetchdf())
    base_name, base = next(iter(results.items()))
    problems = []
    for shape_name, got in results.items():
        if got != base:
            # symmetric difference: a one-sided Counter subtraction is
            # empty when `got` is a strict subset of `base` (review
            # catch — a dropped row would report as '[]')
            diff = list(((got - base) + (base - got)).items())[:3]
            problems.append(
                f"{shape_name} differs from {base_name}: {diff}"
            )
    return problems


def main() -> int:
    sys.path.insert(0, "/root/repo")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e

    oracles = e.oracle_sql()
    if only:
        unknown = only - set(oracles)
        if unknown:
            # a typo'd entry name must not yield a zero-audit false green
            print(f"unknown entries: {sorted(unknown)}")
            return 2
        oracles = {k: v for k, v in oracles.items() if k in only}

    cons = [(name, shaped_conn(sf_dir, cfg)) for name, cfg in SHAPES]
    bad = []
    for name, sql in sorted(oracles.items()):
        try:
            problems = audit_entry(cons, sql)
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            problems = [f"audit error: {type(ex).__name__}: {ex}"]
        if problems:
            bad.append(name)
            for p in problems:
                print(f"SHAPE-SENSITIVE {name}: {p}", flush=True)
        else:
            print(f"INVARIANT {name}", flush=True)
    print(f"\n{len(oracles)} oracles, {len(bad)} shape-sensitive")
    if bad:
        print("SHAPE-SENSITIVE:", bad)
        return 1
    print("RESULT: ALL INVARIANT")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
