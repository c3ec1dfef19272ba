"""Record explode + recursive struct flatten, the reference adapter's soul.

Reference: the "Multi-Record Cascading Tile Adapter" (``data_adapter.go:12``)
turns one JSON message into k rows -- one per top-level key, the key captured
as ``key_id`` (``data_adapter.go:90-97``) -- then flattens each nested record
depth-first so a leaf at path a->b->c becomes column ``a_b_c``
(``data_adapter.go:73-88``).

Spark-first design: both steps are pure Catalyst expressions -- ``explode``
on a MapType column and a ``select`` of nested field references with aliases.
No UDFs, no shuffles; the whole adapter stays inside WholeStageCodegen and is
a narrow map at any scale.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

log = logging.getLogger(__name__)


def explode_records(
    df: DataFrame,
    col: str,
    key_col: str = "key_id",
    value_col: str = "record",
    outer: bool = False,
) -> DataFrame:
    """Explode a MapType column of record-id -> record into one row per
    record, keeping all other columns.  The map key becomes ``key_col``
    (reference ``data_adapter.go:90-97``: ``mp["key_id"] = ik``).

    ``outer=True`` (r15) uses ``explode_outer`` + a post-explode filter on
    the map key.  Row-identical to the inner explode for map columns
    (JSON map keys are never NULL, so only the NULL/empty-map placeholder
    rows are dropped -- exactly the rows inner explode drops), but the
    plan differs: inner ``explode`` plants an implicit
    ``size(col) > 0 AND isnotnull(col)`` pre-filter that Catalyst pushes
    below any repartition, re-evaluating the (expensive) map-producing
    expression on the UN-split input -- the parse then runs twice, once
    single-threaded.  The outer form's filter references the generator
    OUTPUT, which cannot sink below the Generate, so the parse runs once,
    after the split (guide SS4.4's duplicated-evaluation trap, JVM
    edition)."""
    other = [c for c in df.columns if c != col]
    if outer:
        return df.select(
            *other, F.explode_outer(F.col(col)).alias(key_col, value_col)
        ).filter(F.col(key_col).isNotNull())
    return df.select(*other, F.explode(F.col(col)).alias(key_col, value_col))


def _leaves(
    dtype: T.DataType, ref_path: list[str], name_path: list[str], sep: str
) -> list[tuple[str, Column]]:
    """Depth-first leaf walk.  ``ref_path`` addresses the field in the
    DataFrame; ``name_path`` builds the flat output name (may exclude the
    root struct column's own name)."""
    if isinstance(dtype, T.StructType):
        out: list[tuple[str, Column]] = []
        for field in dtype.fields:
            out.extend(
                _leaves(field.dataType, ref_path + [field.name], name_path + [field.name], sep)
            )
        return out
    name = sep.join(name_path)
    ref = F.col(".".join(f"`{p}`" for p in ref_path))
    return [(name, ref.alias(name))]


def flattened_leaf_columns(
    df: DataFrame, col: str, sep: str = "_", keep_prefix: bool = False
) -> list[tuple[str, Column]]:
    """(flat_name, Column) pairs for every leaf under struct column ``col``.

    With ``keep_prefix`` the struct column's own name heads each flat name
    (``col_a_b``); without (the reference behavior -- the record struct is
    anonymous) names start at the first nested field (``a_b``).
    """
    dtype = df.schema[col].dataType
    if not isinstance(dtype, T.StructType):
        raise TypeError(f"column {col!r} is {dtype.simpleString()}, not struct")
    name_root = [col] if keep_prefix else []
    out: list[tuple[str, Column]] = []
    for field in dtype.fields:
        out.extend(
            _leaves(field.dataType, [col, field.name], name_root + [field.name], sep)
        )
    return out


def flatten_struct(
    df: DataFrame,
    cols: list[str] | None = None,
    sep: str = "_",
    sort_columns: bool = True,
    keep_prefix: bool = False,
) -> DataFrame:
    """Recursively flatten StructType columns of ``df`` into leaf columns.

    ``cols`` limits flattening to the named struct columns (default: every
    struct column).  With ``sort_columns`` the flattened names are ordered
    lexicographically (reference ``data_adapter.go:103-106``); non-struct
    columns keep their positions in front.  Name collisions (an ``a_b``
    leaf next to an ``a.b`` path) mirror the reference's silent last-wins
    overwrite (``data_adapter.go:87``), with a log warning.
    """
    struct_cols = cols or [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StructType)
    ]
    passthrough = [c for c in df.columns if c not in struct_cols]
    flat: dict[str, Column] = {}
    for c in struct_cols:
        for name, expr in flattened_leaf_columns(df, c, sep=sep, keep_prefix=keep_prefix):
            if name in flat or name in passthrough:
                log.warning("flatten collision on %r: later value wins", name)
            flat[name] = expr
    names = sorted(flat) if sort_columns else list(flat)
    return df.select(*passthrough, *[flat[n] for n in names])
