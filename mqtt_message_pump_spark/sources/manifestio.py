"""Shared Python-native manifest-sink IO for the no-JVM reader
processes: the ``sink_tail`` stream reader and the ``manifest_sink``
batch reader both resolve the sink's live manifest set, list a
manifest's data files, infer the merged schema, and read data files as
Arrow batches through these helpers -- over a pluggable filesystem
handle (:mod:`mqtt_message_pump_spark.sources._fsio`), so the same code
runs on local paths and on s3://hdfs:// URIs.

The resolution semantics are NOT re-implemented here: the pure core
(:func:`sinks._resolve_manifest_entries` -- snapshot overlay,
time-scoped supersedes, tombstone rule) is shared with the JVM-side
loader, so the two paths cannot diverge.  Reference anchor for the
storage surface being read: ``data_dbstore.go:122-147``.
"""

from __future__ import annotations

import json
import time

from mqtt_message_pump_spark.sinks import (
    SnapshotUnreadable,
    _ManifestVanished,
    _resolve_manifest_entries,
    _snap_cache_get,
    _snap_seq,
)


def live_set(fs, table_path: str) -> "list[dict]":
    """The sink's LIVE manifest set via the Python-native handle -- the
    :func:`sinks._load_manifest_state` twin for no-JVM reader
    processes.  Applies the same vanished-manifest retry as the JVM
    loader, so a concurrent snapshot fold re-lists and converges."""
    mdir = f"{table_path}/_manifests"
    if not fs.isdir(mdir):
        return []
    for _ in range(3):
        try:
            try:
                entries = [
                    (n, mt)
                    for n, mt in fs.listdir_mtime(mdir)
                    if n.endswith(".json") and not n.startswith(".")
                ]
            except FileNotFoundError as e:
                raise _ManifestVanished(str(e)) from None

            mtimes = dict(entries)

            def read_json(name: str) -> dict:
                def _load() -> dict:
                    try:
                        return json.loads(
                            fs.read_bytes(f"{mdir}/{name}")
                        )
                    except FileNotFoundError:
                        raise _ManifestVanished(name) from None

                # immutable snapshot objects parse ONCE per (name,
                # mtime) -- the streaming tail calls this every
                # microbatch, and at 10k embedded manifests the
                # re-parse would dominate the trigger (shared cache
                # with the JVM loader, sinks._SNAP_CACHE)
                if _snap_seq(name) is not None and name in mtimes:
                    return _snap_cache_get(
                        table_path, name, mtimes[name], _load
                    )
                return _load()

            return _resolve_manifest_entries(entries, read_json)["live"]
        except _ManifestVanished:
            time.sleep(0.05)
            continue
    raise IOError(
        f"manifest listing of {table_path} kept changing under the "
        "reader (3 attempts); concurrent maintenance is deleting "
        "manifests without publishing replacements first"
    )


def snapshot_set(fs, table_path: str, as_of: int) -> "list[dict]":
    """One SNAPSHOT's embedded manifest set, verbatim (the pinned-read
    twin of :func:`sinks.read_sink`'s ``as_of`` path): no standalone
    overlay, loud :class:`sinks.SnapshotUnreadable` when the snapshot
    or any attempt dir it names was vacuumed past retention."""
    mdir = f"{table_path}/_manifests"
    names = [
        (n, mt)
        for n, mt in (fs.listdir_mtime(mdir) if fs.isdir(mdir) else [])
        if _snap_seq(n) == as_of
    ]
    if not names:
        raise SnapshotUnreadable(
            f"snapshot seq {as_of} of {table_path} not found; it may "
            "have aged out under the vacuum retention rule -- pinned "
            "reads must finish (or re-pin) within retention_secs"
        )
    snap = _snap_cache_get(
        table_path, names[0][0], names[0][1],
        lambda: json.loads(fs.read_bytes(f"{mdir}/{names[0][0]}")),
    )
    live = [m for m in snap.get("manifests", []) if "dir" in m]
    gone = [
        m["dir"] for m in live if not fs.isdir(f"{table_path}/{m['dir']}")
    ]
    if gone:
        raise SnapshotUnreadable(
            f"snapshot seq {as_of} of {table_path} references "
            f"{len(gone)} vacuumed attempt dir(s) (e.g. {gone[0]}); "
            "increase vacuum retention_secs beyond the pin lifetime"
        )
    return live


def resolve_as_of_ts(fs, table_path: str, ts) -> int:
    """Delta ``timestampAsOf`` for the no-JVM readers: newest retained
    snapshot published at-or-before the instant (snapshot-object mtime
    = publish order, the same stamp ``sinks.list_snapshots`` reports);
    loud :class:`sinks.SnapshotUnreadable` when none is.  ``ts``: epoch
    seconds, ISO string, or datetime -- string normalization (ISO
    first, then finite epoch seconds) lives in ONE place,
    ``sinks._as_of_ts_ms``."""
    from mqtt_message_pump_spark.sinks import _as_of_ts_ms

    t_ms = _as_of_ts_ms(ts)
    mdir = f"{table_path}/_manifests"
    snaps = sorted(
        (seq, mt)
        for n, mt in (fs.listdir_mtime(mdir) if fs.isdir(mdir) else [])
        if (seq := _snap_seq(n)) is not None
    )
    elig = [seq for seq, mt in snaps if mt <= t_ms]
    if not elig:
        raise SnapshotUnreadable(
            f"no snapshot of {table_path} at or before {ts!r} "
            f"({len(snaps)} retained snapshot(s)); it may have aged "
            "out under vacuum retention"
        )
    return elig[-1]


def manifest_files(fs, table_path: str, m: dict) -> "list[str]":
    """Data files of one live manifest, sink-relative.  Batch manifests
    record them; compact manifests are listed from the attempt dir."""
    if m.get("files"):
        return list(m["files"])
    root = f"{table_path}/{m['dir']}"
    prefix = table_path.rstrip("/") + "/"
    out = []
    for p in fs.walk_files(root):
        name = p.rsplit("/", 1)[-1]
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            out.append(p[len(prefix):] if p.startswith(prefix) else p)
    return sorted(out)


def infer_sink_schema(fs, table_path: str, live: "list[dict]"):
    """Merged Spark schema of a sink's live batches, NEWEST batch first:
    under live-set ordering the first manifest is typically the OLDEST,
    so single-file inference silently dropped post-widening columns
    (ADVICE r12).  Permissive promotion unifies widened types
    (int32/int64, float/double); on an ununifiable conflict the newest
    batch's schema wins."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import from_arrow_schema
    from pyspark.sql.types import DateType, StructField

    schemas, first_file = [], None
    for m in sorted(live, key=lambda m: m.get("ts", 0), reverse=True):
        if "dir" not in m:
            continue  # drop tombstone: metadata only, no files
        files = manifest_files(fs, table_path, m)
        if not files:
            continue
        if first_file is None:
            first_file = files[0]
        schemas.append(
            fs.read_parquet_schema(f"{table_path}/{files[0]}")
        )
    if not schemas:
        raise ValueError(
            f"{table_path} has no committed batches to infer a schema "
            "from; pass .option('schema', '<ddl>')"
        )
    try:
        pa_schema = pa.unify_schemas(schemas, promote_options="permissive")
    except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError):
        pa_schema = schemas[0]  # newest batch wins on conflict
    st = from_arrow_schema(pa_schema)
    if "collect_date=" in first_file:
        st = st.add(StructField("collect_date", DateType()))
    return st


def fs_now_ms(fs, table_path: str) -> int:
    """The sink filesystem's clock via a probe object -- the
    :func:`sinks._fs_now_ms` twin for no-JVM writer processes (writers
    on different hosts cannot compare wall clocks; the store's mtime
    authority is the one clock they share)."""
    import uuid

    probe = f".tmp-clock-{uuid.uuid4().hex[:8]}"
    fs.mkdirs(table_path)
    fs.write_bytes(f"{table_path}/{probe}", b"")
    try:
        for name, mt in fs.listdir_mtime(table_path):
            if name == probe:
                return mt
        raise IOError(f"clock probe {probe} vanished under {table_path}")
    finally:
        fs.delete(f"{table_path}/{probe}")


def ensure_writer_lease_py(
    fs,
    table_path: str,
    owner: str,
    lease_secs: float = 120.0,
    held: "dict | None" = None,
) -> dict:
    """Single-writer fencing through the Python-native handle -- the
    :func:`sinks.ensure_writer_lease` twin for the native
    ``manifest_sink`` writers (their ``commit`` runs in a plain Python
    worker, no SparkSession).  Shares the SAME lease object
    (``<table_path>/_writer.json``: owner, fencing token, lease_secs,
    mtime = renewal stamp), so a JVM-side pump and a native writer
    fence each other symmetrically.

    ``held`` is the caller's previously returned lease (the writer
    instance keeps it across micro-batches): verified-and-renewed when
    still current, :class:`sinks.WriterFenced` raised on takeover.
    Renewal republishes the object (no ``setTimes`` in the seam); the
    brief delete-rename absence window is covered by the claimant-side
    delayed re-read, exactly the documented S3A posture."""
    import time as _time

    from mqtt_message_pump_spark.sinks import WriterFenced

    lease_path = f"{table_path}/_writer.json"

    def _read():
        try:
            raw = fs.read_bytes(lease_path)
        except (FileNotFoundError, OSError):
            return None, 0
        mt = 0
        try:
            for name, m in fs.listdir_mtime(table_path):
                if name == "_writer.json":
                    mt = m
                    break
        except FileNotFoundError:
            return None, 0
        try:
            return json.loads(raw), mt
        except ValueError:
            return None, 0

    cur, cur_mtime = _read()
    if held is not None:
        if cur is not None and (cur.get("owner"), cur.get("token")) != (
            held["owner"], held["token"]
        ):
            raise WriterFenced(
                f"sink {table_path}: writer lease taken over by "
                f"{cur.get('owner')} (token {cur.get('token')}); this "
                "writer must stop"
            )
        publish_object(
            fs, table_path, "_writer.json",
            json.dumps(held, sort_keys=True).encode(),
        )
        return held
    if cur is None:
        _time.sleep(0.2)  # mid-renewal absence window: re-read
        cur, cur_mtime = _read()
    if cur is not None and cur.get("owner") != owner:
        age_ms = fs_now_ms(fs, table_path) - cur_mtime
        if age_ms <= float(cur.get("lease_secs", lease_secs)) * 1000:
            raise WriterFenced(
                f"sink {table_path}: active writer {cur.get('owner')} "
                f"holds the lease (renewed {age_ms / 1000:.0f}s ago); "
                "refusing to write"
            )
    token = int(cur.get("token", 0)) + 1 if cur is not None else 1
    if cur is not None and cur.get("owner") == owner:
        token = int(cur.get("token", 0))  # restart of the same lineage
    lease = {"owner": owner, "token": token, "lease_secs": lease_secs}
    publish_object(
        fs, table_path, "_writer.json",
        json.dumps(lease, sort_keys=True).encode(),
    )
    after, _ = _read()
    if after is None or (after.get("owner"), after.get("token")) != (
        owner, token
    ):
        raise WriterFenced(
            f"sink {table_path}: lost the lease claim race to "
            f"{after.get('owner') if after else '<vanished>'}"
        )
    return lease


def publish_object(fs, dirpath: str, name: str, payload: bytes) -> None:
    """Atomic single-object publish through a Python-native handle --
    the :func:`sinks._publish_manifest` twin for the no-JVM writer
    processes: write a uniquely-named tmp object, then move it over the
    destination (the destination is one small object, so its appearance
    is atomic-in-effect on every store class)."""
    import uuid

    fs.mkdirs(dirpath)
    tmp = f"{dirpath}/.tmp-{name}-{uuid.uuid4().hex[:8]}"
    fs.write_bytes(tmp, payload)
    dest = f"{dirpath}/{name}"
    try:
        if fs.exists(dest):
            fs.delete(dest)
        fs.rename(tmp, dest)
    except Exception:
        fs.delete(tmp)
        raise


def _arrow_filter_expr(schema, filters):
    """pyarrow dataset expression from the pushed constraint tuples
    ``(col, op, value)`` -- ROW-GROUP pushdown inside surviving files
    (VERDICT r13 #3).  Safety rules keep this a pure optimization under
    Spark's residual re-apply: only STRING-typed columns present in the
    file schema participate (the constraint values are the planner's
    stringified forms, exact for strings; Arrow and Spark share binary
    UTF-8 ordering), and a NULL row fails every comparison in both
    engines.  Unmatched constraints are simply not applied."""
    import pyarrow as pa
    import pyarrow.dataset as ds

    expr = None
    for col, op, val in filters:
        idx = schema.get_field_index(col)
        if idx < 0 or schema.field(idx).type != pa.string():
            continue
        f = ds.field(col)
        if op == "in":
            e = f.isin(list(val))
        elif op == "eq":
            e = f == val
        elif op == "gte":
            e = f >= val
        elif op == "lte":
            e = f <= val
        elif op == "gt":
            e = f > val
        elif op == "lt":
            e = f < val
        else:
            continue
        expr = e if expr is None else (expr & e)
    return expr


def read_files_arrow(fs, table_path: str, rel_files, target, filters=()):
    """Yield Arrow record batches of ``rel_files`` aligned to the
    ``target`` Arrow schema: the hive ``collect_date`` partition value
    is reattached from the path, pre-widening batches NULL-fill missing
    columns (the ``merge_schema`` read semantics), and the final cast
    widens promoted types (int32 files under an int64 target).

    ``filters`` (``(col, op, value)`` tuples from the pushdown planner)
    prune WITHIN each file: the writers sort rows by (mid, topic) per
    batch (``manifestsink._write_task_files``), so parquet row-group
    min/max stats cluster the key space and a point probe materializes
    ~one row group instead of the whole file.  Spark re-applies every
    pushed filter row-level, so this can only shrink the Arrow
    transfer, never change results."""
    import datetime

    import pyarrow as pa

    for rel in rel_files:
        expr = None
        if filters:
            try:
                expr = _arrow_filter_expr(
                    fs.read_parquet_schema(f"{table_path}/{rel}"),
                    filters,
                )
            except Exception:
                expr = None  # schema probe failed: read unfiltered
        tbl = (
            fs.read_parquet_filtered(f"{table_path}/{rel}", expr)
            if expr is not None
            else fs.read_parquet(f"{table_path}/{rel}")
        )
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
        for name in target.names:
            if name not in tbl.column_names:
                tbl = tbl.append_column(
                    name, pa.nulls(len(tbl), type=target.field(name).type)
                )
        tbl = tbl.select(target.names).cast(target)
        for batch in tbl.to_batches():
            yield batch
