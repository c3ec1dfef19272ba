#!/usr/bin/env python
"""Round-16 interleaved A/B panel (bench.py's method, one session).

A = committed code.  B = ``materialize_once`` disabled (identity), i.e.
the r15 shapes for the corpus-family queries the round-16 snapshot
touched -- toggled by rebinding the name in the two consuming modules,
so both variants run interleaved in ONE session and host-contention
bursts hit both alike.  Drift-watch keys (VERDICT r15 item 8) run as
A-only timings in the same loop.

    SPARK_GRAFT_CPUS=32 python tools/r16_ab_panel.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from mqtt_message_pump_spark.plans import QUERIES, corpus, llm, registry
from mqtt_message_pump_spark.session import get_spark

AB_KEYS = [
    "q_tfidf_top",
    "q_bm25_top",
    "q_lm_score",
    "q_boiler_strip",
    "q_ngram_jaccard",
    "q_bigram_pmi",
]
DRIFT_KEYS = ["q_minhash_pairs", "q_cosine_topk"]


def set_matonce(enabled: bool) -> None:
    fn = registry.materialize_once if enabled else (lambda df: df)
    corpus.materialize_once = fn
    llm.materialize_once = fn


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r16-ab-panel")
    bench.force(QUERIES["q_count"](spark, sf_dir))

    # one untimed warm-up per (key, variant) so codegen is compiled for both
    for enabled in (True, False):
        set_matonce(enabled)
        for key in AB_KEYS:
            bench.force(QUERIES[key](spark, sf_dir))
    set_matonce(True)
    for key in DRIFT_KEYS:
        bench.force(QUERIES[key](spark, sf_dir))

    times: dict[str, list[float]] = {}
    for rep in range(reps):
        for enabled, tag in ((True, "A"), (False, "B")):
            set_matonce(enabled)
            for key in AB_KEYS:
                spark.sparkContext.setJobDescription(f"{key}:{tag}:rep{rep}")
                t0 = time.perf_counter()
                bench.force(QUERIES[key](spark, sf_dir))
                times.setdefault(f"{key}:{tag}", []).append(
                    time.perf_counter() - t0
                )
        set_matonce(True)
        for key in DRIFT_KEYS:
            spark.sparkContext.setJobDescription(f"{key}:A:rep{rep}")
            t0 = time.perf_counter()
            bench.force(QUERIES[key](spark, sf_dir))
            times.setdefault(f"{key}:A", []).append(time.perf_counter() - t0)
        print(f"# rep {rep} done", file=sys.stderr)
    set_matonce(True)

    out = {
        k: {"min": round(min(v), 3), "all": [round(t, 3) for t in v]}
        for k, v in sorted(times.items())
    }
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "times": out}, indent=1))


if __name__ == "__main__":
    main()
