#!/usr/bin/env python
"""Dump `.explain("formatted")` for every bench query into
plans/r<N>/<query>_<suffix>.txt — the before/after plan evidence the
optimization rounds commit.

Usage:
  python scripts/dump_round_plans.py <round> <suffix> [query ...]
e.g.
  python scripts/dump_round_plans.py 13 after
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rnd, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", f"r{rnd}")
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("bdf-spark-dump-plans")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from basic_data_fusion_spark.caching import release_cached
    from bench import HEADLINE

    qs = entry.queries()
    for name in (names or HEADLINE):
        fn = qs.get(name)
        if fn is None:
            print(f"MISSING {name}")
            continue
        df = fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", flush=True)
        release_cached()
    spark.stop()


if __name__ == "__main__":
    main()
