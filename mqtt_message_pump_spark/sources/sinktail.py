"""Streaming tail of a manifest sink: ``spark.readStream.format(
"sink_tail").option("path", <table_path>)``.

The pull API (:func:`sinks.read_sink_since`) makes the caller checkpoint
its own cursor; this Spark 4 Python DataSource wraps the SAME delta
logic (:func:`sinks._tail_delta`) as a native Structured Streaming
source, so the cursor IS the stream's offset -- checkpointed by Spark's
offset log, replayed exactly like any other source, and composable with
every downstream streaming operator (watermarked windows, stateful
dedup, ``foreachBatch`` into the next manifest sink).  A pump writing
``raw_message`` and a downstream tokenize/dedup/ANN-encode stage tailing
it is the reference's dual-sink fan-out (``data_processor.go:78-79``)
one hop downstream, now with exactly-once delivery end to end.

Semantics (inherited from the delta core, ``sinks.read_sink_since``):

- a replay republish of a delivered batch (same key, new attempt dir,
  identical rows) is never re-delivered;
- a retention drop is never delivered (erased rows must not resurrect
  downstream); tombstone victims are marked consumed;
- a compaction that folded UNDELIVERED batches fails the query loudly
  with :class:`sinks.TailLost` (restart the stream with a fresh
  checkpoint for a full re-read; size ``compact keep_last``/cadence
  over the stream's trigger lag to avoid it);
- the first micro-batch delivers the full current live set (including
  consolidated compact attempts) -- the backlog bootstrap.

Driver/executor IO note: the stream reader runs in a plain Python
process (no JVM), so the manifest log and the data files are read with
Python-native IO (``os`` + ``pyarrow``).  That covers local and
NFS-mounted paths -- this environment -- and the adapter surface is two
small functions (:func:`_local_live` and the per-file reads in
``read``), which is where an ``fsspec``/``pyarrow.fs`` handle for
s3a/HDFS plugs in on a cluster.  The listing applies the SAME
vanished-manifest retry as the JVM loader, so a concurrent snapshot
fold under the tail re-lists and converges.
"""

from __future__ import annotations

import json
import os
import time

try:  # Spark >= 4 Python data source API
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    _DS_OK = True
    _DS_ERR = None
except ImportError as e:  # pragma: no cover - pyspark < 4
    DataSource = object  # type: ignore
    DataSourceStreamReader = object  # type: ignore
    InputPartition = object  # type: ignore
    _DS_OK = False
    _DS_ERR = e

from mqtt_message_pump_spark.sinks import (
    TailLost,
    _batch_name_key,
    _ManifestVanished,
    _resolve_manifest_entries,
    _tail_delta,
)


def _local_live(table_path: str) -> list[dict]:
    """The sink's LIVE manifest set via Python-native IO -- the
    :func:`sinks._load_manifest_state` twin for the no-JVM stream-reader
    process, sharing the pure resolution core (snapshot overlay,
    time-scoped supersedes, tombstone rule) so the two loaders cannot
    diverge."""
    mdir = os.path.join(table_path, "_manifests")
    if not os.path.isdir(mdir):
        return []
    for _ in range(3):
        try:
            entries = []
            for n in sorted(os.listdir(mdir)):
                if not n.endswith(".json") or n.startswith("."):
                    continue
                try:
                    mt = int(os.stat(os.path.join(mdir, n)).st_mtime * 1000)
                except FileNotFoundError:
                    raise _ManifestVanished(n) from None
                entries.append((n, mt))

            def read_json(name: str) -> dict:
                try:
                    with open(os.path.join(mdir, name)) as f:
                        return json.load(f)
                except FileNotFoundError:
                    raise _ManifestVanished(name) from None

            return _resolve_manifest_entries(entries, read_json)["live"]
        except _ManifestVanished:
            time.sleep(0.05)
            continue
    raise IOError(
        f"manifest listing of {table_path} kept changing under the tail "
        "(3 attempts); concurrent maintenance is deleting manifests "
        "without publishing replacements first"
    )


def _manifest_files(table_path: str, m: dict) -> list[str]:
    """Data files of one live manifest, sink-relative.  Batch manifests
    record them; compact manifests (bootstrap-only delivery) are listed
    from the attempt dir."""
    if m.get("files"):
        return list(m["files"])
    out = []
    root = os.path.join(table_path, m["dir"])
    for dirpath, _dirs, names in os.walk(root):
        for n in names:
            if n.endswith(".parquet") and not n.startswith(("_", ".")):
                rel = os.path.relpath(os.path.join(dirpath, n), table_path)
                out.append(rel)
    return sorted(out)


class SinkTailDataSource(DataSource):
    """``format("sink_tail")``.  Options:

    - ``path`` (required): the manifest sink's table_path;
    - ``schema`` (optional DDL): the output schema; inferred from the
      first live data file (+ the ``collect_date`` partition column)
      when omitted;
    - ``max_batches_per_trigger`` (optional, default unbounded): at most
      this many new sink batches per lineage per micro-batch, backlog
      included -- the ``maxFilesPerTrigger`` analog for draining a
      backlog in bounded steps (consolidated compact attempts are
      unsplittable and always ride the window they appear in).
    """

    @classmethod
    def name(cls) -> str:
        return "sink_tail"

    def schema(self):
        ddl = self.options.get("schema")
        if ddl:
            return ddl
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import DateType, StructField

        path = self.options["path"]
        # Merge schemas ACROSS live manifests, newest batch first: under
        # live-set ordering the first manifest is typically the OLDEST
        # batch, so inferring from it alone silently dropped every
        # column added by a later schema widening (ADVICE r12) -- the
        # stream's select(target.names) never surfaced them.  Newest-
        # first keeps the widened batch's field order and types
        # (permissive promotion unifies int32/int64 etc.); pre-widening
        # batches NULL-fill at read exactly as before.
        schemas, first_file = [], None
        for m in sorted(
            _local_live(path), key=lambda m: m.get("ts", 0), reverse=True
        ):
            files = _manifest_files(path, m)
            if not files:
                continue
            if first_file is None:
                first_file = files[0]
            schemas.append(pq.read_schema(os.path.join(path, files[0])))
        if not schemas:
            raise ValueError(
                f"sink_tail: {path} has no committed batches to infer a "
                "schema from; pass .option('schema', '<ddl>')"
            )
        try:
            pa_schema = pa.unify_schemas(
                schemas, promote_options="permissive"
            )
        except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError):
            pa_schema = schemas[0]  # newest batch wins on conflict
        st = from_arrow_schema(pa_schema)
        if "collect_date=" in first_file:
            st = st.add(StructField("collect_date", DateType()))
        return st

    def streamReader(self, schema):
        if not _DS_OK:  # pragma: no cover - pyspark < 4
            raise ImportError(
                "sink_tail requires Spark >= 4's Python data source API"
            ) from _DS_ERR
        return SinkTailStreamReader(self.options, schema)


class _ManifestPartition(InputPartition):
    def __init__(self, table_path: str, files: list[str]) -> None:
        self.table_path = table_path
        self.files = files


class SinkTailStreamReader(DataSourceStreamReader):
    """Offsets ARE the change-feed cursor (``{"epochs": {lineage:
    max_batch_id}}``), so the offset log checkpoints exactly the state
    :func:`sinks.read_sink_since` asks callers to persist.
    ``initialOffset`` is the empty dict (the pre-bootstrap marker: no
    ``epochs`` key), and ``latestOffset`` is STATELESS -- derived from
    the live manifest set alone via the bootstrap delta, so it is
    monotone as the sink grows and identical after a driver restart."""

    def __init__(self, options, schema) -> None:
        self.path = options["path"]
        self._schema = schema
        # trigger sizing: at most this many NEW batches per lineage per
        # micro-batch (0 = unbounded) -- the maxFilesPerTrigger analog,
        # so a year of backlog drains in bounded triggers instead of one
        # giant micro-batch.  The clamp advances from the last COMMITTED
        # position (handed to commit() each trigger and on restart
        # restore; partitions() also folds the authoritative end in as a
        # belt-and-suspenders against offset regression).  Compact-dir
        # and tombstone marks cannot be split, so they floor the window
        # regardless of the clamp.
        self._max_batches = int(options.get("max_batches_per_trigger", "0"))
        self._committed: dict = {}

    def initialOffset(self):
        return {}

    def _observe_committed(self, end: dict) -> None:
        cur = self._committed
        for e, i in end.get("epochs", {}).items():
            if i > cur.get(e, -1):
                cur[e] = i

    def latestOffset(self):
        live = _local_live(self.path)
        _, cur = _tail_delta(live, None, self.path)
        epochs = dict(cur["epochs"])
        if self._max_batches > 0:
            floor: dict[str, int] = {}
            for m in live:
                if m.get("kind") in ("compact", "drop"):
                    for v in m.get("supersedes", []):
                        k = _batch_name_key(v)
                        if k and k[1] > floor.get(k[0], -1):
                            floor[k[0]] = k[1]
            last = self._committed
            epochs = {
                e: max(
                    min(i, last.get(e, -1) + self._max_batches),
                    floor.get(e, -1),
                    last.get(e, -1),
                )
                for e, i in epochs.items()
            }
        return {"epochs": epochs}

    def partitions(self, start, end):
        self._observe_committed(end)
        live = _local_live(self.path)
        bootstrap = "epochs" not in start
        prior = dict(start.get("epochs", {}))
        upper = dict(end.get("epochs", {}))
        parts: list[_ManifestPartition] = []
        for m in live:
            kind = m.get("kind")
            if kind == "drop" or "dir" not in m:
                continue
            if kind == "compact":
                victims = [
                    k
                    for k in (
                        _batch_name_key(v) for v in m.get("supersedes", [])
                    )
                    if k
                ]
                scoped = {i for e, i in victims if e}
                victims = [
                    (e, i) for e, i in victims if e or i not in scoped
                ]
                if bootstrap and all(
                    i <= upper.get(e, -1) for e, i in victims
                ):
                    # one partition PER FILE: executor-side read
                    # parallelism scales with data, not batch count
                    parts.extend(
                        _ManifestPartition(self.path, [f])
                        for f in _manifest_files(self.path, m)
                    )
                    continue
                lost = [
                    (e, i) for e, i in victims if i > prior.get(e, -1)
                ]
                if lost:
                    raise TailLost(
                        f"sink {self.path}: compaction {m['name']} "
                        f"folded {len(lost)} undelivered batch(es); "
                        "restart the stream from a fresh checkpoint for "
                        "a full re-read"
                    )
                continue
            key = _batch_name_key(m["name"])
            if key is None:
                continue
            e, i = key
            if not (prior.get(e, -1) < i <= upper.get(e, -1)):
                continue
            replaced = [
                k
                for k in (
                    _batch_name_key(v) for v in m.get("supersedes", [])
                )
                if k
            ]
            if any(ki <= prior.get(ke, -1) for ke, ki in replaced):
                continue  # same-rows replacement of a delivered twin
            parts.extend(
                _ManifestPartition(self.path, [f])
                for f in _manifest_files(self.path, m)
            )
        # Spark requires a non-empty partition list per batch; an empty
        # window reads zero rows through one no-op partition
        return parts or [_ManifestPartition(self.path, [])]

    def commit(self, end) -> None:
        # nothing to reclaim (manifests are retired by the sink's own
        # maintenance, never by readers); remember the committed
        # position so latestOffset can clamp the next trigger's window
        self._observe_committed(end)

    def read(self, partition):
        import datetime

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._schema)
        for rel in partition.files:
            tbl = pq.read_table(os.path.join(partition.table_path, rel))
            if "collect_date=" in rel and "collect_date" in target.names:
                val = rel.split("collect_date=")[1].split("/")[0]
                try:
                    d = datetime.date.fromisoformat(val)
                except ValueError:
                    d = None  # __HIVE_DEFAULT_PARTITION__: NULL date
                tbl = tbl.append_column(
                    "collect_date",
                    pa.array([d] * len(tbl), type=pa.date32()),
                )
            # by-name alignment with NULL fill: batches written before a
            # schema widening (StoreConf.schema_evolution) lack the new
            # columns -- the same semantics as read_sink(merge_schema)
            for name in target.names:
                if name not in tbl.column_names:
                    tbl = tbl.append_column(
                        name,
                        pa.nulls(len(tbl), type=target.field(name).type),
                    )
            tbl = tbl.select(target.names).cast(target)
            for batch in tbl.to_batches():
                yield batch


def register_sink_tail_source(spark) -> None:
    """Register ``format("sink_tail")`` on this session."""
    spark.dataSource.register(SinkTailDataSource)
