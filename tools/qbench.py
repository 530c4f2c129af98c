"""Per-query micro-bench for optimization rounds: time selected queries
(noop sink, median of N) and optionally dump .explain("formatted").

Usage:
  python tools/qbench.py [--n 5] [--plan-dir plans/r16] [--suffix before] \
      [--sf SF_DIR] query [query ...]

Prints one line per query: name, median, min, max, cold (first run).
Honors $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from hive_lineage_spark.session import get_spark

    spark = get_spark("qbench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    from hive_lineage_spark.sources.registry import load_events

    load_events(spark, args.sf)

    for name in args.queries:
        if name not in qs:
            print(f"{name}: NOT FOUND")
            continue
        spark.sparkContext.setJobDescription(f"qbench:{name}")
        runs = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        if args.plan_dir:
            os.makedirs(os.path.join(REPO, args.plan_dir), exist_ok=True)
            plan = qs[name](spark, args.sf)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            path = os.path.join(REPO, args.plan_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
        print(
            f"{name}: median={statistics.median(runs):.3f} "
            f"min={min(runs):.3f} max={max(runs):.3f} cold={runs[0]:.3f} n={args.n}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
