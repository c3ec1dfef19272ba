"""Schema inference from a JSON sample string.

Reference behavior (``data_adapter.go:99-124``, ``data_adapter.go:149-157``):
the adapter-table schema is inferred ONCE at startup from a configured JSON
sample whose top level is a map of record-id -> record.  Each record is
flattened depth-first (path joined with ``_``), leaf Go types are reflected
into a tiny lattice (every JSON number -> Float64, string -> String,
bool -> Bool), column names are sorted lexicographically before DDL
emission (``data_adapter.go:103-106``), and a ``key_id`` column carries the
top-level record key (``data_adapter.go:90-97``).  When the sample holds
several records, later records are cross-checked against the first and a
mismatch only logs a warning -- first record wins (``data_adapter.go:114-123``).

We reproduce those rules exactly in :func:`infer_flat_schema` (the parity
surface, golden-tested against ``release_20120128/readme.txt:40``) and also
expose :func:`infer_spark_schema`, the Spark-native upgrade: real type
inference via ``spark.read.json`` (LongType vs DoubleType, nested arrays),
which the streaming pump uses for ``from_json``.
"""

from __future__ import annotations

import json
import logging
import warnings

from pyspark.sql import SparkSession
from pyspark.sql import types as T

log = logging.getLogger(__name__)

KEY_ID = "key_id"

# Reference type lattice: Go encoding/json decodes every number as float64;
# reflection + strings.Title yields these names (data_adapter.go:108-112).
_REFERENCE_TYPE_NAMES = {str: "String", bool: "Bool", int: "Float64", float: "Float64"}
_SPARK_TYPES = {
    "String": T.StringType(),
    "Bool": T.BooleanType(),
    "Float64": T.DoubleType(),
}


class SchemaDrift(UserWarning):
    """Raised-as-warning when sample records disagree on the inferred schema
    (the reference logs and keeps the first record's schema)."""


def _flatten_record(record: dict, sep: str = "_", prefix: str = "") -> dict:
    """Depth-first flatten of a nested dict; leaf at path a->b->c becomes
    key ``a_b_c``.  Mirrors ``getItemFromMap`` (data_adapter.go:73-88),
    including its silent last-wins behavior on name collisions
    (data_adapter.go:87)."""
    out: dict = {}
    for k, v in record.items():
        path = f"{prefix}{sep}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten_record(v, sep=sep, prefix=path))
        else:
            out[path] = v
    return out


def _record_columns(record: dict, sep: str = "_") -> list[tuple[str, str]]:
    flat = _flatten_record(record, sep=sep)
    cols = [(k, _REFERENCE_TYPE_NAMES.get(type(v), "String")) for k, v in flat.items()]
    cols.append((KEY_ID, "String"))
    return sorted(cols)  # lexicographic, like sort.Strings at data_adapter.go:106


def infer_flat_schema(sample: str, sep: str = "_") -> list[tuple[str, str]]:
    """Infer the flattened column list from a JSON sample.

    Returns lexicographically sorted ``(column_name, type_name)`` pairs with
    the reference's type names (String/Bool/Float64) and the injected
    ``key_id`` column.  Multi-record samples are cross-checked; drift emits
    a :class:`SchemaDrift` warning and the first record wins.
    """
    payload = json.loads(sample)
    if not isinstance(payload, dict) or not payload:
        raise ValueError("sample must be a non-empty JSON object of record-id -> record")
    first: list[tuple[str, str]] | None = None
    for record_key, record in payload.items():
        if not isinstance(record, dict):
            raise ValueError(
                f"top-level value for key {record_key!r} is not an object; "
                "the multi-record adapter requires record-id -> object"
            )
        cols = _record_columns(record, sep=sep)
        if first is None:
            first = cols
        elif cols != first:
            warnings.warn(
                f"schema drift between sample records: {first} vs {cols}; "
                "keeping the first record's schema",
                SchemaDrift,
                stacklevel=2,
            )
    assert first is not None
    return first


def flat_schema_to_struct(cols: list[tuple[str, str]]) -> T.StructType:
    """Spark StructType for a reference-inferred flat column list."""
    return T.StructType([T.StructField(n, _SPARK_TYPES[t], True) for n, t in cols])


def sample_record_schema(spark: SparkSession, sample: str) -> T.StructType:
    """Spark-native schema of ONE record (a top-level map value), inferred
    with Spark's JSON reader so ints stay LongType etc.  Multi-record
    samples contribute all records to inference (Spark merges)."""
    payload = json.loads(sample)
    records = [json.dumps(v) for v in payload.values()]
    return spark.read.json(spark.sparkContext.parallelize(records, 1)).schema


def infer_spark_schema(spark: SparkSession, sample: str) -> T.MapType:
    """Schema for ``from_json`` over a whole payload: top-level map of
    record-id -> record struct."""
    return T.MapType(T.StringType(), sample_record_schema(spark, sample))
