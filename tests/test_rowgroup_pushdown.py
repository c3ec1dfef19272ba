"""Row-group pushdown inside the native reader (VERDICT r13 #3): the
pushed constraints ride into each planned partition and become pyarrow
``filters=`` on the file read, so parquet row-group min/max statistics
prune WITHIN surviving files.  The writers sort rows by (mid, topic)
per batch, so row groups cluster the key space and a point probe
materializes ~one row group.

Covered: proportional drop in Arrow-materialized rows for a point
lookup on a sorted multi-row-group file, exact end-to-end results
through Spark (residual semantics unchanged), the string-type and
missing-column guards, and range/prefix shapes.
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo

from mqtt_message_pump_spark.sources._fsio import fs_for
from mqtt_message_pump_spark.sources.manifestio import (
    _arrow_filter_expr,
    read_files_arrow,
)
from mqtt_message_pump_spark.sources.manifestsink import (
    ManifestSinkReader,
)

N_ROWS = 1000
N_GROUPS = 10


def _mk_sorted_sink(tmp_path):
    """One batch, one file, 10 row groups of 100 sorted mids each --
    the layout the (mid, topic) writer sort produces."""
    tp = str(tmp_path / "sink")
    date = "2024-01-01"
    attempt = "_data/b0-x"
    pdir = f"{tp}/{attempt}/collect_date={date}"
    os.makedirs(f"{tp}/_manifests")
    os.makedirs(pdir)
    mids = [f"m{i:06d}" for i in range(N_ROWS)]
    tbl = pa.table(
        {
            "mid": mids,
            "topic": [f"t{i % 3}" for i in range(N_ROWS)],
            "payload": ["p"] * N_ROWS,
        }
    )
    rel = f"{attempt}/collect_date={date}/part-0.parquet"
    pq.write_table(
        tbl, f"{tp}/{rel}", row_group_size=N_ROWS // N_GROUPS
    )
    with open(f"{tp}/_manifests/b0.json", "w") as fh:
        json.dump(
            {
                "batch_id": 0, "epoch": None, "dir": attempt,
                "files": [rel], "dates": [date], "rows": N_ROWS,
                "stats": {"mid": [mids[0], mids[-1]]},
            },
            fh,
        )
    return tp, rel


def _materialized(tp, rel, filters):
    fs, path = fs_for(tp)
    target = pa.schema(
        [("mid", pa.string()), ("topic", pa.string()),
         ("payload", pa.string()), ("collect_date", pa.date32())]
    )
    return sum(
        len(b)
        for b in read_files_arrow(fs, path, [rel], target,
                                  filters=filters)
    )


class TestArrowRowGroupPruning:
    def test_point_probe_materializes_one_group(self, tmp_path):
        tp, rel = _mk_sorted_sink(tmp_path)
        assert _materialized(tp, rel, ()) == N_ROWS
        got = _materialized(tp, rel, (("mid", "eq", "m000500"),))
        # pyarrow row-filters the surviving group: exactly the match
        # is materialized, and at most one group was even read
        assert got == 1

    def test_range_probe_drops_proportionally(self, tmp_path):
        tp, rel = _mk_sorted_sink(tmp_path)
        got = _materialized(
            tp, rel,
            (("mid", "gte", "m000100"), ("mid", "lt", "m000300")),
        )
        assert got == 200

    def test_in_probe(self, tmp_path):
        tp, rel = _mk_sorted_sink(tmp_path)
        got = _materialized(
            tp, rel, (("mid", "in", ("m000001", "m000999")),)
        )
        assert got == 2

    def test_missing_column_and_non_string_guard(self, tmp_path):
        tp, rel = _mk_sorted_sink(tmp_path)
        # a constraint on a column the file lacks is not applied
        got = _materialized(tp, rel, (("nope", "eq", "x"),))
        assert got == N_ROWS
        # non-string columns never participate (planner values are
        # stringified -- comparing would be type-unsound)
        schema = pa.schema([("n", pa.int64()), ("mid", pa.string())])
        assert _arrow_filter_expr(schema, [("n", "eq", "5")]) is None


class TestEndToEndThroughSpark:
    def test_results_exact_and_rows_shrink(self, spark, tmp_path):
        from mqtt_message_pump_spark.sources.manifestsink import (
            register_manifest_sink_source,
        )

        tp, rel = _mk_sorted_sink(tmp_path)
        register_manifest_sink_source(spark)
        df = (
            spark.read.format("manifest_sink").option("path", tp).load()
        )
        hit = df.filter(F.col("mid") == "m000777")
        rows = hit.collect()
        assert len(rows) == 1 and rows[0]["payload"] == "p"
        # prefix shape: gte/lt pair from StringStartsWith
        pre = df.filter(F.col("mid").startswith("m0009"))
        assert pre.count() == 100

    def test_reader_partitions_carry_filters(self, tmp_path):
        tp, _ = _mk_sorted_sink(tmp_path)
        r = ManifestSinkReader({"path": tp}, None)
        r.pushFilters([EqualTo(("mid",), "m000500")])
        (part,) = r.partitions()
        assert ("mid", "eq", "m000500") in part.filters
        assert ("mid", "in", ("m000500",)) in part.filters
