#!/usr/bin/env python
"""Per-query build/plan/exec breakdown of the bench rows (r13 tool).

For each HEADLINE query: ``bld`` = Python builds the DataFrame (driver
py4j/plan-construction cost), ``pln`` = force ``executedPlan``
(analysis+optimization), ``exe`` = noop-sink execution.  Bench
lifecycle: one warmup run, then best-of-N with clearCache +
release_cached between queries — same methodology as bench.py, so the
``tot`` column is comparable to the stamped bench.

Usage:
  python scripts/profile_queries.py [query ...]   # default: all HEADLINE
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_RUNS (default 2).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    runs = max(1, int(os.environ.get("SPARK_GRAFT_RUNS", "2")))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bdf-spark-profile")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from basic_data_fusion_spark.caching import release_cached
    from bench import HEADLINE

    qs = entry.queries()
    names = sys.argv[1:] or HEADLINE
    rows = []
    print(f"{'query':36s} {'tot':>7s} {'bld':>7s} {'pln':>7s} {'exe':>7s}")
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"{name:36s} MISSING")
            continue
        sc = spark.sparkContext
        sc.setJobDescription(f"profile:{name}")
        # warmup (unmeasured)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        release_cached()
        best = None
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            cur = (t3 - t0, t1 - t0, t2 - t1, t3 - t2)
            if best is None or cur[0] < best[0]:
                best = cur
            release_cached()
        rows.append((name,) + best)
        print(f"{name:36s} {best[0]:7.2f} {best[1]:7.2f} "
              f"{best[2]:7.2f} {best[3]:7.2f}", flush=True)
    tot = sum(r[1] for r in rows)
    bld = sum(r[2] for r in rows)
    pln = sum(r[3] for r in rows)
    exe = sum(r[4] for r in rows)
    print(f"{'TOTAL':36s} {tot:7.2f} {bld:7.2f} {pln:7.2f} {exe:7.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
