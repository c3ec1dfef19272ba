#!/usr/bin/env python
"""Dump .explain("formatted") for every bench headline query into
plans/r16/<query>_<tag>.txt (tag = before/after), for the round-16
optimization evidence trail.

    python tools/r16_plans.py before [key ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mqtt_message_pump_spark.plans import QUERIES
from mqtt_message_pump_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16")


def headline_keys() -> list[str]:
    import bench

    return list(bench.HEADLINE)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    keys = sys.argv[2:] or headline_keys()
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name=f"r16-plans-{tag}")
    for key in keys:
        if key == "pump_batch":
            continue
        df = QUERIES[key](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{key}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        n_ex = buf.getvalue().count("Exchange")
        print(f"{key}: {path} (Exchange x{n_ex})")


if __name__ == "__main__":
    main()
