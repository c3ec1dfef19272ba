"""Session catalog for manifest sinks: one call registers a sink's
data view plus its metadata twins, so SQL users get the whole round-13
surface -- pruned native reads, Iceberg-``.files`` / Delta-HISTORY
metadata tables, and name resolution for the DML statement layer
(:mod:`~mqtt_message_pump_spark.sqlstmt`) -- without per-session
boilerplate.  The reference's store IS a named SQL table the user
queries directly (``data_dbstore.go:56-76`` creates it;
``data_dbstore.go:229`` reads it); this is that ergonomic surface over
the manifest protocol.

- ``<name>``: the data, served by the native ``manifest_sink`` source.
  Registered with ``pushdown=off`` BY DEFAULT: Spark 4.1's Python
  data sources cache ONE read plan per relation and a filtered scan
  overwrites it, so a long-lived view serving queries with varying
  filters would silently lose rows under manifest pruning (the
  upstream defect documented on ``ManifestSinkDataSource``; canary
  test in ``tests/test_sqlstmt.py``).  Pass ``pushdown=True`` to
  opt back into manifest/bloom pruning when EVERY query against the
  view carries a pushable filter (e.g. an always-date-scoped
  dashboard).  The view PINS the manifest state it resolves at its
  FIRST query (read info is materialized once per relation) -- the
  same stable-read semantics as ``read_sink(as_of=...)``, extended to
  the view's lifetime.  Appends/DML land in the sink immediately
  (``read_sink`` / a fresh ``load()`` see them); call :func:`refresh`
  to re-point the view at the current state.
- ``<name>_files`` / ``<name>_history``: the batch inventory and the
  operation log.  These are driver-materialized snapshots of the
  manifest log *at registration time* (they are built by one manifest
  listing, not a lazy source); :func:`refresh` re-materializes them
  too.  Kept eager deliberately: a lazy metadata source would re-list
  manifests on every SQL touch of what is almost always an operator's
  one-shot inspection.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

__all__ = [
    "DEFAULT_PUSHDOWN",
    "register_sink",
    "registered_sinks",
    "sink_path",
    "refresh",
]

# session-uuid -> {name: path}; sessions are few and long-lived, the
# map is tiny metadata -- no eviction needed
_REGISTRY: "dict[str, dict[str, str]]" = {}

_NAME = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

# The module-wide default for register_sink's ``pushdown`` argument.
# False guards the upstream Spark 4.1 readInfo-reuse defect (a
# long-lived view's filtered scan poisons later unfiltered queries --
# see the module docstring and TestUpstreamReadInfoPoisoning).  The
# canary is written to FAIL the moment Spark fixes the reuse; when it
# does, flip THIS constant to True and every registered view gets full
# manifest/bloom pruning -- no other edits (the parity test
# TestPushdownDefaultFlip pins that the flip alone suffices).  Until
# then, statement-layer reads (execute_sql SELECT) already prune fully
# via per-statement relations.
DEFAULT_PUSHDOWN = False


def _skey(spark: SparkSession) -> str:
    # sessionUUID distinguishes newSession() clones sharing one JVM
    return spark.conf.get(
        "spark.sql.session.uuid", str(id(spark._jsparkSession))
    )


def register_sink(
    spark: SparkSession,
    path: str,
    name: str,
    metadata: bool = True,
    pushdown: "bool | None" = None,
) -> dict:
    """Register manifest sink ``path`` as temp view ``name`` (+
    ``<name>_files`` / ``<name>_history`` unless ``metadata=False``)
    and record the name for statement-layer resolution
    (``execute_sql("DELETE FROM <name> ...")``).  Idempotent;
    re-registering refreshes the metadata snapshots and re-points the
    name.  Returns ``{"name", "path", "views"}``."""
    from mqtt_message_pump_spark.sinks import (
        _hadoop_fs,
        files_sink,
        history_sink,
    )
    from mqtt_message_pump_spark.sources.manifestsink import (
        register_manifest_sink_source,
    )

    if pushdown is None:
        pushdown = DEFAULT_PUSHDOWN
    if not _NAME.match(name):
        raise ValueError(
            f"sink view name {name!r} must be a bare SQL identifier"
        )
    fs, HPath = _hadoop_fs(spark, path)
    if not fs.exists(HPath(f"{path}/_manifests")):
        raise ValueError(f"{path} is not a manifest sink")
    register_manifest_sink_source(spark)
    (
        spark.read.format("manifest_sink")
        .option("path", path)
        .option("pushdown", "auto" if pushdown else "off")
        .load()
        .createOrReplaceTempView(name)
    )
    views = [name]
    if metadata:
        files_sink(spark, path).createOrReplaceTempView(f"{name}_files")
        history_sink(spark, path).createOrReplaceTempView(
            f"{name}_history"
        )
        views += [f"{name}_files", f"{name}_history"]
    _REGISTRY.setdefault(_skey(spark), {})[name] = {
        "path": path, "metadata": metadata, "pushdown": pushdown,
    }
    return {"name": name, "path": path, "views": views}


def registered_sinks(spark: SparkSession) -> "dict[str, str]":
    """name -> path for this session's registered sinks."""
    return {
        n: r["path"] for n, r in _REGISTRY.get(_skey(spark), {}).items()
    }


def sink_path(spark: SparkSession, name: str) -> "str | None":
    rec = _REGISTRY.get(_skey(spark), {}).get(name)
    return rec["path"] if rec is not None else None


def refresh(spark: SparkSession, name: "str | None" = None) -> list:
    """Re-materialize the metadata views (and re-point the data view)
    for ``name``, or for every registered sink when omitted; each
    keeps its registration's ``metadata``/``pushdown`` settings."""
    reg = _REGISTRY.get(_skey(spark), {})
    names = [name] if name is not None else sorted(reg)
    out = []
    for n in names:
        if n not in reg:
            raise ValueError(f"{n!r} is not a registered sink")
        r = reg[n]
        out.append(
            register_sink(
                spark, r["path"], n,
                metadata=r["metadata"], pushdown=r["pushdown"],
            )
        )
    return out
