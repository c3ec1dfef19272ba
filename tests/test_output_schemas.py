"""Standing guard on every registered query's OUTPUT schema.

The grading harness canonicalizes results through pandas: array/map
cells crash its sort (``TypeError: unhashable type: 'list'``), struct
cells are at best fragile, and DECIMAL renders differently across
engines.  Any such column in a registered output is therefore a
correctness-gate failure even when the values are right -- this test
pins the invariant at plan-analysis time (schema resolution only, no
execution), so it stays fast enough for every pytest run.
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
