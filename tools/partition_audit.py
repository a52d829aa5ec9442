"""Partition/batch-shape invariance audit: does every entry produce the
same canonicalized output under ADVERSARIAL parallelism settings?

The driver's session shape is not ours to choose: it has run local[4]
shuffle=4 while tests run local[32] shuffle=32, and nothing pins what a
future round (or a 1000-executor cluster) uses. Any entry whose output
depends on partition count, input-split packing, Arrow batch
boundaries, or AQE coalescing decisions is a latent driver red of the
same passes-locally-fails-there family as the r7 libm flip — and at
100 TB the partition layout is GUARANTEED to differ from every local
run. Known members of the class this audit would have caught design-
time: EliminateSorts dropping sortWithinPartitions under collect_list
(r5), AQE byte-coalescing changing which rows share a mapInPandas
batch, limit(k)-without-order, float aggregation order off the decimal
grid.

Method: run the FULL registry compare (Spark vs the partition-
independent DuckDB oracle) under two deliberately hostile sessions —

  A: local[5], shuffle.partitions=1  (everything collapses to one
     partition; aggregation/window order maximally different), AQE off,
     Arrow batches of 7 rows (mapInPandas state/boundary bugs fire),
     64 KiB maxPartitionBytes + zero openCost (input splits maximally
     fragmented).
  B: local[3], shuffle.partitions=37 (prime — no key alignment with
     any power-of-two assumption), AQE on with tiny advisory sizes
     (coalescing + skew-split decisions exercised), Arrow batches of 3.

An entry that matches the oracle under BOTH is partition-shape
invariant for every axis we can vary locally. Entries are compared at
sf0.001 by default (the axis under test is shape, not data volume).

Run:  python tools/partition_audit.py [sf_dir] [entry ...]
Exit 0 = all invariant. Fast pytest subset: tests/test_partition_invariance.py.
"""

from __future__ import annotations

import os
import sys
import time

CONFIGS = {
    "one-partition": {
        "master": "local[5]",
        "spark.sql.shuffle.partitions": "1",
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "7",
        "spark.sql.files.maxPartitionBytes": str(64 * 1024),
        "spark.sql.files.openCostInBytes": "0",
        "spark.default.parallelism": "5",
    },
    "prime-partitions": {
        "master": "local[3]",
        "spark.sql.shuffle.partitions": "37",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "3",
        "spark.default.parallelism": "3",
    },
}


def build_session(label: str):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
        # a fresh JVM-side context needs the old one fully gone
        time.sleep(1)
    cfg = CONFIGS[label]
    b = SparkSession.builder.master(cfg["master"]).appName(
        f"partition_audit_{label}"
    )
    for k, v in cfg.items():
        if k != "master":
            b = b.config(k, v)
    b = b.config("spark.driver.memory", "8g")
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> int:
    sys.path.insert(0, "/root/repo")
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if argv and os.path.isdir(argv[0]):
        sf_dir = argv[0]
        argv = argv[1:]
    only = set(argv)

    import __spark_entry__ as e
    from tests.oracle_harness import compare, duckdb_conn

    qs = e.queries()
    oracles = e.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd entry (or an sf_dir that failed isdir and fell through
        # to the entry filter) must not yield a zero-compare false green
        print(f"unknown entries: {sorted(unknown)}")
        return 2
    con = duckdb_conn(sf_dir)

    failed: dict[str, list[str]] = {}
    for label in CONFIGS:
        spark = build_session(label)
        t0 = time.time()
        n = 0
        for name, fn in qs.items():
            if only and name not in only:
                continue
            if name not in oracles:
                continue
            n += 1
            try:
                problems = compare(fn(spark, sf_dir), con, oracles[name], name)
            except Exception as ex:  # noqa: BLE001 — report, keep sweeping
                problems = [f"{name}: exception {type(ex).__name__}: {ex}"]
            if problems:
                failed.setdefault(name, []).extend(
                    f"[{label}] {p}" for p in problems
                )
                for p in problems:
                    print(f"PART-FAIL [{label}] {p}", flush=True)
            else:
                print(f"PART-OK [{label}] {name}", flush=True)
        print(
            f"-- config {label}: {n} entries in {time.time() - t0:.0f}s",
            flush=True,
        )

    print(f"\n{len(failed)} partition-sensitive entries")
    if failed:
        print("FAILED:", sorted(failed))
        return 1
    print("RESULT: ALL PARTITION-INVARIANT")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
