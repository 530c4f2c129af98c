"""Interleaved A/B bench: time queries under several config variants
ROUND-ROBIN within one session, so box drift hits every variant equally
(the sequential-configs matrix was confounded by a quieting box).

Variants toggle runtime-settable knobs only:
  - fanout: SPARK_GRAFT_FANOUT env (read per query build)
  - coalesce: spark.sql.adaptive.coalescePartitions.minPartitionSize
  - opencost: spark.sql.files.openCostInBytes

Usage: python tools/abbench.py [--n 5] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANTS = {
    "cur": {"fanout": "1", "coalesce": str(64 * 1024), "opencost": str(16 * 1024)},
    "nofan": {"fanout": "0", "coalesce": str(64 * 1024), "opencost": str(16 * 1024)},
    "coal1m": {"fanout": "1", "coalesce": str(1024 * 1024), "opencost": str(16 * 1024)},
    "open4m": {"fanout": "1", "coalesce": str(64 * 1024), "opencost": str(4 * 1024 * 1024)},
    "alloff": {"fanout": "0", "coalesce": str(1024 * 1024), "opencost": str(4 * 1024 * 1024)},
    "o4c1m": {"fanout": "1", "coalesce": str(1024 * 1024), "opencost": str(4 * 1024 * 1024)},
    # new-default candidate: fan-out (split-aware, hash-keyed) + 64K coalesce + default opencost
    "new": {"fanout": "1", "coalesce": str(64 * 1024), "opencost": str(4 * 1024 * 1024)},
    "newrr": {
        "fanout": "1",
        "coalesce": str(64 * 1024),
        "opencost": str(4 * 1024 * 1024),
        "hash": "0",
    },
    # fan-out off at otherwise-current defaults: isolates the fan-out
    # exchange itself (the "new" twin with only the repartition removed)
    "nofan4m": {"fanout": "0", "coalesce": str(64 * 1024), "opencost": str(4 * 1024 * 1024)},
    # r17 fan-out width floors: cap partitions at one per FLOOR input
    # bytes (0 = uncapped, the r16 behavior)
    "floor0": {"fanout": "1", "coalesce": str(64 * 1024), "opencost": str(4 * 1024 * 1024), "floor": "0"},
    "floor16k": {"fanout": "1", "coalesce": str(64 * 1024), "opencost": str(4 * 1024 * 1024), "floor": str(16 * 1024)},
    "floor32k": {"fanout": "1", "coalesce": str(64 * 1024), "opencost": str(4 * 1024 * 1024), "floor": str(32 * 1024)},
    "floor128k": {"fanout": "1", "coalesce": str(64 * 1024), "opencost": str(4 * 1024 * 1024), "floor": str(128 * 1024)},
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()
    variants = {k: VARIANTS[k] for k in args.variants.split(",")}

    import __spark_entry__ as entrymod
    from hive_lineage_spark.session import get_spark
    from hive_lineage_spark.sources.registry import load_events

    spark = get_spark("abbench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    load_events(spark, args.sf)

    results: dict[tuple[str, str], list[float]] = {}
    for name in args.queries:
        # one untimed warm run (current config) to build persisted caches.
        # NOTE (r16 ADVICE): frames built inside _persisted are cached per
        # (session, sf_dir, tag) and keep whatever fan-out env built them —
        # so for cached-index queries only the NON-persisted part of the
        # plan is actually A/B'd here. That is the intended comparison for
        # warm-path decisions; cold-path decisions need a per-variant
        # clear_postings_cache() run instead (accepting cold rebuild cost
        # in every timed run).
        os.environ["SPARK_GRAFT_FANOUT"] = "1"
        qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
        for r in range(args.n):
            for vname, v in variants.items():
                os.environ["SPARK_GRAFT_FANOUT"] = v["fanout"]
                os.environ["SPARK_GRAFT_FANOUT_HASH"] = v.get("hash", "1")
                os.environ["SPARK_GRAFT_FANOUT_FLOOR"] = v.get("floor", "0")
                spark.conf.set(
                    "spark.sql.adaptive.coalescePartitions.minPartitionSize", v["coalesce"]
                )
                spark.conf.set("spark.sql.files.openCostInBytes", v["opencost"])
                spark.sparkContext.setJobDescription(f"ab:{name}:{vname}:{r}")
                t0 = time.perf_counter()
                qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
                results.setdefault((name, vname), []).append(time.perf_counter() - t0)
        row = " ".join(
            f"{vname}={statistics.median(results[(name, vname)]):.3f}" for vname in variants
        )
        print(f"{name}: {row}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
