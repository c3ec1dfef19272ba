#!/usr/bin/env python
"""Round-16 larger-SF spot bench (VERDICT r15 item 3): time the heaviest
headline slots on the 10x data derived by ``tools/make_spotbench.py``,
with EXACTLY bench.py's method (one untimed warm-up, min of 3 timed runs,
noop sink).  Evidence artifact only -- the driver's bench contract and SF
are untouched.

    SPARK_GRAFT_CPUS=32 python tools/spot_bench.py /root/sfbench/sf1 [key ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from mqtt_message_pump_spark.plans import QUERIES
from mqtt_message_pump_spark.session import get_spark

# the 12 heaviest driver-measured r15 slots
DEFAULT_KEYS = [
    "q_corpus_pipeline", "q_minhash_pairs", "q_dedup_groups",
    "q_ann_ivfpq", "q_decontam", "q_lm_score", "q_sessionize",
    "q_simhash_pairs", "q_local_volume", "q_pricing_summary",
    "q_ship_priority", "q_boiler_strip",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/sfbench/sf1"
    keys = sys.argv[2:] or DEFAULT_KEYS
    spark = get_spark(app_name="spot-bench")
    bench.force(QUERIES["q_count"](spark, sf_dir))
    results, medians = {}, {}
    for key in keys:
        mn, med = bench.time_query(QUERIES[key], spark, sf_dir, key)
        results[key] = round(mn, 3)
        medians[key] = round(med, 3)
    print(json.dumps({
        "metric": "spot_bench_sec",
        "sf_dir": sf_dir,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
        "value": round(sum(results.values()), 3),
        "queries": results,
        "queries_median": medians,
    }))


if __name__ == "__main__":
    main()
