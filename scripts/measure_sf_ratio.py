#!/usr/bin/env python
"""Time named contract queries at sf0.1 and sf1 (best-of-N each) and
print the 10x-data runtime ratio — the SCALE.md spot-check harness.

Usage: python scripts/measure_sf_ratio.py q1 q2 ...   [N via BEST_OF]
sf1 tier comes from scripts/make_sf1.py (default /root/repo/.scaledata/sf1).
Run on a quiet box; per-query ratios are the signal, not absolutes.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import SparkSession

SF01 = os.environ.get("SF01", "/root/testdata/sf0.1")
SF1 = os.environ.get("SF1", "/root/repo/.scaledata/sf1")
BEST_OF = int(os.environ.get("BEST_OF", "3"))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: measure_sf_ratio.py <query> [query ...]")
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    qs = entry.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             # sf1 sessions need a real heap: operators that persist
             # corpus-sized relations thrash the default 1g into false
             # multi-minute "regressions" (SCALE.md r5 note)
             .config("spark.driver.memory", "16g")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    # OUTPUT MASS beside time (r10 verdict #6): span/pair operators'
    # outputs legitimately grow faster than input rows at sf1 (the
    # planted near-dup cliques), so the tracked number for those rows
    # is time-per-output-row — a >4x wall ratio with a >4x rows ratio
    # is output growth; a flat rows ratio with a growing per-row ratio
    # is a hidden quadratic.
    print("| query | sf0.1 s | sf1 s | ratio (10x data) "
          "| rows sf0.1 | rows sf1 | s/1k rows ratio |")
    print("|---|---|---|---|---|---|---|")
    for name in names:
        times, rows = {}, {}
        for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            best = float("inf")
            for _ in range(BEST_OF):
                t0 = time.perf_counter()
                # noop sink, same as bench.py: .count() lets Catalyst
                # PRUNE branches that provably don't change cardinality
                # (left joins onto key-unique aggregates, final
                # projections), silently under-measuring report-shaped
                # queries — observed: the r11 sweeps read "flat 1.0x"
                # under count() vs their real 1.8x under full
                # materialization
                df = qs[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[label] = best
            rows[label] = df.count()
        r = times["sf1"] / times["sf0.1"]
        per_row = ((times["sf1"] / max(rows["sf1"], 1))
                   / (times["sf0.1"] / max(rows["sf0.1"], 1)))
        print(f"| `{name}` | {times['sf0.1']:.2f} | {times['sf1']:.2f} "
              f"| {r:.1f}x | {rows['sf0.1']} | {rows['sf1']} "
              f"| {per_row:.2f}x |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
