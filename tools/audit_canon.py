#!/usr/bin/env python
"""Driver-canonicalizer fidelity audit.

The grading driver canonicalizes BOTH engines' results through pandas
(sort columns by name, sort rows, hash values).  Two failure classes are
invisible to a ``fetchall``-based comparison but fatal under pandas canon:

1. **dtype skew** -- DuckDB converts HUGEINT (the result type of ``SUM``
   over any integral column) to *float64* in ``.df()``, so the oracle
   renders ``14.0`` where Spark renders ``14``: rows/schema match, hash
   doesn't.  (Root cause of the r4 ``q_audio_energy`` red row.)
2. **container columns** -- ``pandas.sort_values`` crashes with
   ``TypeError: unhashable type: 'list'`` on array-typed values, so ANY
   registered output with an array/map column kills the driver row before
   it can even count rows.  (Root cause of the r4 ``q_vector_quantize`` /
   ``q_media_decode`` reds.)

This tool runs every registered key at a small SF and reports both
classes the way the driver would see them: Spark via ``toPandas``, the
oracle via ``.df()``, both pushed through the same sort+stringify canon.

    python tools/audit_canon.py [sf_dir] [key ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame | str:
    """Driver-shaped canon: sort columns by name, stringify, sort rows.

    Returns the canonical frame, or an error string if the frame cannot be
    canonicalized (container values) -- which the driver reports as a
    crashed row.
    """
    df = df[sorted(df.columns)]
    try:
        s = df.astype(str)
        s = s.sort_values(list(s.columns)).reset_index(drop=True)
    except TypeError as exc:
        return f"CANON-CRASH: {exc}"
    return s


def container_cols(df: pd.DataFrame) -> list[str]:
    import numpy as np

    bad = []
    for c in df.columns:
        col = df[c]
        if col.dtype == object and len(col):
            v = col.iloc[0]
            if isinstance(v, (list, dict, np.ndarray)):
                bad.append(c)
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as E

    queries, oracles = E.queries(), E.oracle_sql()
    keys = sys.argv[2:] or sorted(queries)

    # AUDIT_ARROW=1 flips toPandas to the Arrow path: the driver's
    # spark-side conversion settings are unknown, and Arrow changes some
    # pandas dtypes (e.g. date -> datetime64 vs object) -- running the
    # audit both ways proves the greens don't depend on the conversion.
    arrow = os.environ.get("AUDIT_ARROW", "0")
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("canon-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config(
            "spark.sql.execution.arrow.pyspark.enabled",
            "true" if arrow == "1" else "false",
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failed = []
    for key in keys:
        try:
            sdf = queries[key](spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"{key}: SPARK-ERROR {type(exc).__name__}: {exc}")
            failed.append(key)
            continue
        problems = []
        s_bad = container_cols(sdf)
        if s_bad:
            problems.append(f"spark container cols {s_bad}")
        if key in oracles:
            try:
                ddf = duck.execute(oracles[key]).df()
            except Exception as exc:  # noqa: BLE001
                print(f"{key}: ORACLE-ERROR {type(exc).__name__}: {exc}")
                failed.append(key)
                continue
            d_bad = container_cols(ddf)
            if d_bad:
                problems.append(f"oracle container cols {d_bad}")
            # dtype skew is only fatal if the stringified canon differs
            # (ns-vs-us timestamps and int32-vs-int64 render identically
            # and have been driver-green; int-vs-float renders 14 vs 14.0
            # and is the r4 q_audio_energy red) -- so the authoritative
            # signal is the canon value comparison below.
            skew = {
                c: (str(sdf[c].dtype), str(ddf[c].dtype))
                for c in sdf.columns
                if c in ddf.columns and str(sdf[c].dtype) != str(ddf[c].dtype)
            }
            if not problems:
                cs, cd = canon(sdf), canon(ddf)
                if isinstance(cs, str) or isinstance(cd, str):
                    problems.append(f"{cs if isinstance(cs, str) else cd}")
                elif len(cs) != len(cd):
                    problems.append(f"rows {len(cs)} vs {len(cd)}")
                elif not cs.equals(cd):
                    neq = (cs != cd).any(axis=1)
                    problems.append(
                        f"value diff rows={int(neq.sum())} "
                        f"skew={skew} "
                        f"first={cs[neq].head(1).to_dict('records')} vs "
                        f"{cd[neq].head(1).to_dict('records')}"
                    )
            if len(sdf) == 0:
                problems.append("VACUOUS: 0 rows (hash match proves nothing)")
        else:
            c = canon(sdf)
            if isinstance(c, str):
                problems.append(c)
        if problems:
            print(f"{key}: FAIL {'; '.join(problems)}")
            failed.append(key)
        else:
            print(f"{key}: ok ({len(sdf)} rows)")
    print(f"\n{len(keys) - len(failed)}/{len(keys)} ok; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
