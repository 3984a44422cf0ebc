"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall times.

Execution is forced with the noop sink (full computation, no driver-side
collect cost), matching how a cluster job would be measured.
"""

from __future__ import annotations

import json
import os
import sys
import time

from nomenklatura_spark.session import get_spark

# Headline set: the flagship blocker stages + representative relational,
# dedup, text and ANN operators.
BENCH_QUERIES = [
    "pricing_summary",
    "top_revenue_nations",
    "events_user_topk",
    "blocker_entries",
    "blocker_pairs",
    "blocker_match",
    "dedup_ngram_pairs",
    "dedup_components",
    "doc_stats",
    "doc_quality",
    "ann_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    spark = get_spark("nomenklatura-spark-bench", cpus=cpus,
                      shuffle_partitions=cpus)
    from nomenklatura_spark.plans.queries import QUERIES

    timings: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        start = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        elapsed = round(time.perf_counter() - start, 3)
        timings[name] = elapsed
        total += elapsed
        print(f"# {name}: {elapsed:.3f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
