#!/usr/bin/env python
"""Driver-emulation oracle sweep: run every registered query AND its DuckDB
oracle side by side at a given scale factor, compare like the grading driver
(columns sorted by name, rows as sorted normalized tuples).

Deliberately uses a PLAIN SparkSession with a non-UTC time zone (the driver
does not apply our session defaults), so session-config bugs surface here.

    python tools/sweep_oracles.py [sf_dir] [key ...]

Defaults: sf_dir=/root/testdata/sf0.01, all oracle-checked keys.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


class DecimalLeak(Exception):
    """A Decimal value reached a query/oracle output.

    Hard failure: decimal rendering is not hash-stable under the driver's
    canonicalization (``Decimal('100.00')`` on one side hashes differently
    from the float ``100.0`` the other side renders).  Every registered
    query must cast decimal outputs to DOUBLE on BOTH engines.
    """


def _normalize(col_names, rows):
    import datetime
    import decimal

    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    cols = [col_names[i] for i in order]

    def norm(v):
        if v is None:
            return ""
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, decimal.Decimal):
            raise DecimalLeak(
                "Decimal value in output -- cast to DOUBLE on both sides"
            )
        if isinstance(v, (datetime.datetime, datetime.date)):
            return str(v)
        if isinstance(v, bool):
            return str(v)
        if isinstance(v, bytes):
            return v.hex()
        if isinstance(v, list):
            return "[" + ",".join(norm(x) for x in v) + "]"
        return str(v)

    vals = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return cols, vals


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as E

    queries, oracles = E.queries(), E.oracle_sql()
    keys = sys.argv[2:] or sorted(queries)

    # SWEEP_PARTITIONS overrides the shuffle-partition count: re-running
    # the whole registry under a different parallelism is the registry-wide
    # partition-invariance check (results must be layout-independent).
    parts = os.environ.get("SWEEP_PARTITIONS", "8")
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-sweep")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.session.timeZone", "America/New_York")
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
        if key not in oracles:
            # rows-only key: the driver still executes it in ITS session,
            # so run it here (plain non-UTC session) and require rows>=0
            # with a collectable result -- this catches session-config
            # bugs the UTC pytest session hides.
            try:
                rdf = queries[key](spark, sf_dir)
                dec = [c for c, t in rdf.dtypes if "decimal" in t]
                if dec:
                    raise DecimalLeak(f"decimal output columns {dec}")
                n = len(rdf.collect())
                print(f"{key}: ok rows-only ({n} rows)")
            except Exception as exc:  # noqa: BLE001
                print(f"{key}: ERROR rows-only {type(exc).__name__}: {exc}")
                failed.append(key)
            continue
        try:
            sdf = queries[key](spark, sf_dir)
            dec = [c for c, t in sdf.dtypes if "decimal" in t]
            if dec:
                raise DecimalLeak(f"decimal output columns {dec}")
            s_cols, s_vals = _normalize(
                sdf.columns, [tuple(r) for r in sdf.collect()]
            )
            res = duck.execute(oracles[key])
            d_cols = [d[0] for d in res.description]
            d_vals_raw = res.fetchall()
            d_cols, d_vals = _normalize(d_cols, d_vals_raw)
        except Exception as exc:  # noqa: BLE001
            print(f"{key}: ERROR {type(exc).__name__}: {exc}")
            failed.append(key)
            continue
        if s_cols != d_cols:
            print(f"{key}: FAIL cols {s_cols} vs {d_cols}")
            failed.append(key)
        elif len(s_vals) != len(d_vals):
            print(f"{key}: FAIL rows {len(s_vals)} vs {len(d_vals)}")
            failed.append(key)
        elif s_vals != d_vals:
            bad = [(a, b) for a, b in zip(s_vals, d_vals) if a != b][:2]
            print(f"{key}: FAIL values, first diffs: {bad}")
            failed.append(key)
        else:
            print(f"{key}: ok ({len(s_vals)} rows)")
    print(f"\n{len(keys) - len(failed)}/{len(keys)} ok; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
