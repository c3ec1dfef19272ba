"""Standing guard on every registered query's OUTPUT schema.

The grading harness canonicalizes results through pandas: array/map
cells crash its sort (``TypeError: unhashable type: 'list'``), struct
cells are at best fragile, and DECIMAL renders differently across
engines.  Any such column in a registered output is therefore a
correctness-gate failure even when the values are right -- this test
pins the invariant at schema-resolution time: no job RUNS for most
keys, but constructing a DataFrame is not free for all of them.  The
ANN plan builders (q_pq_codes / q_ann_pq / q_ann_ivfpq[_search]) train
their codebooks driver-side while BUILDING the plan (bounded sample
collect + numpy Lloyd's -- a deliberate design: the codebook is plan
metadata, like a broadcast literal), so those keys each cost a few
driver-side seconds here.  Accepted: at sf0.001 the whole
parametrized sweep stays ~1 min, and the build-per-plan posture is
exactly what the persisted-index q_ann_ivfpq_search key exists to
amortize at query time.
"""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from mqtt_message_pump_spark.plans import QUERIES

FORBIDDEN = (T.ArrayType, T.MapType, T.StructType, T.DecimalType)


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_registered_output_schema_is_canon_safe(key, spark, sf_dir):
    schema = QUERIES[key](spark, sf_dir).schema
    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, FORBIDDEN)
    ]
    assert not bad, (
        f"{key}: container/decimal output columns {bad} -- the driver's "
        "pandas canonicalizer crashes on arrays/maps and hash-mismatches "
        "decimals; serialize, explode to long form, or cast to double"
    )
