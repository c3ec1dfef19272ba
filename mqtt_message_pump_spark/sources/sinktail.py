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
process (no JVM), so the manifest log and the data files are read
through the pluggable Python-native filesystem seam
(:mod:`sources._fsio` -- ``os``+pyarrow for local/NFS paths,
``pyarrow.fs`` for s3://hdfs:// URIs, picked from the path's scheme)
via the shared manifest-IO helpers (:mod:`sources.manifestio`).  The
listing applies the SAME vanished-manifest retry as the JVM loader, so
a concurrent snapshot fold under the tail re-lists and converges.
"""

from __future__ import annotations

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
    _is_swap_epoch,
    _tail_delta,
)
from mqtt_message_pump_spark.sources._fsio import fs_for
from mqtt_message_pump_spark.sources.manifestio import (
    infer_sink_schema,
    live_set,
    manifest_files,
    read_files_arrow,
)


class SinkTailDataSource(DataSource):
    """``format("sink_tail")``.  Options:

    - ``path`` (required): the manifest sink's table_path (local path
      or any ``pyarrow.fs``-resolvable URI -- s3://, hdfs://...);
    - ``schema`` (optional DDL): the output schema; inferred by merging
      the live batches' file schemas (newest first, + the
      ``collect_date`` partition column) when omitted;
    - ``max_batches_per_trigger`` (optional, default unbounded): at most
      this many new sink batches per lineage per micro-batch, backlog
      included -- the ``maxFilesPerTrigger`` analog for draining a
      backlog in bounded steps (consolidated compact attempts are
      unsplittable and always ride the window they appear in);
    - ``start`` (optional, default ``earliest``): ``earliest`` delivers
      the full current live set as the first micro-batch (the backlog
      bootstrap); ``latest`` primes the initial cursor from the live
      set at stream start, so only batches committed AFTER the stream
      starts deliver -- Kafka's ``startingOffsets`` analog for
      monitoring taps that must not replay history.
    """

    @classmethod
    def name(cls) -> str:
        return "sink_tail"

    def schema(self):
        ddl = self.options.get("schema")
        if ddl:
            return ddl
        fs, path = fs_for(
            self.options["path"], impl=self.options.get("fs_impl")
        )
        return infer_sink_schema(fs, path, live_set(fs, path))

    def streamReader(self, schema):
        if not _DS_OK:  # pragma: no cover - pyspark < 4
            raise ImportError(
                "sink_tail requires Spark >= 4's Python data source API"
            ) from _DS_ERR
        return SinkTailStreamReader(self.options, schema)


class _ManifestPartition(InputPartition):
    def __init__(self, fs, table_path: str, files: list[str]) -> None:
        self.fs = fs
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
        self._fs, self.path = fs_for(
            options["path"], impl=options.get("fs_impl")
        )
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
        self._start = options.get("start", "earliest").lower()
        if self._start not in ("earliest", "latest"):
            raise ValueError(
                f"sink_tail: start={self._start!r} is not one of "
                "'earliest'/'latest'"
            )
        self._committed: dict = {}

    def initialOffset(self):
        if self._start == "latest":
            # prime the cursor from the CURRENT live set: everything
            # already committed is marked delivered, so only batches
            # published after stream start flow.  Called once per
            # checkpoint lifetime (Spark persists the result), so a
            # restart keeps the original stream-start horizon.
            live = live_set(self._fs, self.path)
            _, cur = _tail_delta(live, None, self.path)
            return cur
        return {}

    def _observe_committed(self, end: dict) -> None:
        cur = self._committed
        for e, i in end.get("epochs", {}).items():
            if i > cur.get(e, -1):
                cur[e] = i

    def latestOffset(self):
        live = live_set(self._fs, self.path)
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
        live = live_set(self._fs, self.path)
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
                victims_all = victims  # pre-filter, for swap coverage
                victims = [
                    (e, i) for e, i in victims if e or i not in scoped
                ]
                if bootstrap and all(
                    i <= upper.get(e, -1) for e, i in victims
                ):
                    # one partition PER FILE: executor-side read
                    # parallelism scales with data, not batch count
                    parts.extend(
                        _ManifestPartition(self._fs, self.path, [f])
                        for f in manifest_files(self._fs, self.path, m)
                    )
                    continue
                # swap-lineage coverage, the sinks._tail_delta twin: a
                # DML/restore swap ("u" epoch namespace) compacted away
                # before this stream's next trigger is a same-rows
                # replacement -- having delivered ANY member of that
                # id's folded group covers it; without this the stream
                # dies with a spurious TailLost
                by_id: "dict[int, list]" = {}
                for e, i in victims_all:
                    by_id.setdefault(i, []).append((e, i))

                def _covered(e: str, i: int) -> bool:
                    if i <= prior.get(e, -1):
                        return True
                    group = by_id[i]
                    return any(
                        _is_swap_epoch(ge) for ge, _ in group
                    ) and any(gi <= prior.get(ge, -1) for ge, gi in group)

                lost = [
                    (e, i) for e, i in victims if not _covered(e, i)
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
                _ManifestPartition(self._fs, self.path, [f])
                for f in manifest_files(self._fs, self.path, m)
            )
        # Spark requires a non-empty partition list per batch; an empty
        # window reads zero rows through one no-op partition
        return parts or [_ManifestPartition(self._fs, self.path, [])]

    def commit(self, end) -> None:
        # nothing to reclaim (manifests are retired by the sink's own
        # maintenance, never by readers); remember the committed
        # position so latestOffset can clamp the next trigger's window
        self._observe_committed(end)

    def read(self, partition):
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._schema)
        yield from read_files_arrow(
            partition.fs, partition.table_path, partition.files, target
        )


def register_sink_tail_source(spark) -> None:
    """Register ``format("sink_tail")`` on this session."""
    spark.dataSource.register(SinkTailDataSource)
