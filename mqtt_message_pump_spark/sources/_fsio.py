"""Pluggable Python-native filesystem handles for the no-JVM reader
processes (the ``sink_tail`` stream reader and the ``manifest_sink``
batch reader run in plain Python workers -- no ``SparkSession``, no
Hadoop FS).

Two implementations of one five-method surface:

- :class:`LocalFs` -- ``os`` + local ``pyarrow.parquet`` (local and
  NFS-mounted paths; zero extra deps);
- :class:`ArrowFs` -- any ``pyarrow.fs.FileSystem`` (s3://, hdfs://,
  gcs://...), resolved from the path URI via ``FileSystem.from_uri``
  exactly the way a cluster deployment points the readers at the
  object store.

``fs_for(path)`` picks the handle from the path's scheme and returns
``(handle, normalized_path)``; all handle methods take normalized
(scheme-less) paths, so caller logic is store-agnostic -- the seam the
round-12 design note promised (``sources/sinktail.py`` driver/executor
IO note).  Handles are tiny and picklable: the batch reader is
serialized to the executor-side Python workers with its handle inside
(``ArrowFs`` re-resolves its filesystem lazily after unpickling).
"""

from __future__ import annotations

import os


class LocalFs:
    """Local/NFS filesystem via ``os`` + local pyarrow reads."""

    def listdir_mtime(self, dirpath: str) -> "list[tuple[str, int]]":
        """``[(name, mtime_ms)]`` of a directory's direct children;
        raises FileNotFoundError if an entry vanishes between the
        listing and its stat (the concurrent-maintenance race callers
        retry on)."""
        out = []
        for n in sorted(os.listdir(dirpath)):
            out.append(
                (n, int(os.stat(os.path.join(dirpath, n)).st_mtime * 1000))
            )
        return out

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def walk_files(self, root: str) -> "list[str]":
        """All file paths under ``root`` (recursive), absolute-ish --
        same form the other methods take."""
        out = []
        for dirpath, _dirs, names in os.walk(root):
            for n in names:
                out.append(os.path.join(dirpath, n))
        return out

    def read_parquet(self, path: str):
        import pyarrow.parquet as pq

        return pq.read_table(path)

    def read_parquet_filtered(self, path: str, expr):
        """Row-group-pruned read: pyarrow skips groups whose min/max
        statistics refute ``expr`` and row-filters the rest."""
        import pyarrow.parquet as pq

        return pq.read_table(path, filters=expr)

    def read_parquet_columns(self, path: str, columns: "list[str]"):
        import pyarrow.parquet as pq

        have = set(pq.read_schema(path).names)
        return pq.read_table(path, columns=[c for c in columns if c in have])

    def read_parquet_schema(self, path: str):
        import pyarrow.parquet as pq

        return pq.read_schema(path)

    # ---- write surface (the native manifest_sink writer) ----

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def write_bytes(self, path: str, data: bytes) -> None:
        with open(path, "wb") as f:
            f.write(data)

    def rename(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def delete(self, path: str, recursive: bool = False) -> None:
        import shutil

        if recursive and os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)

    def write_parquet(self, path: str, table) -> None:
        import pyarrow.parquet as pq

        pq.write_table(table, path)

    def parquet_writer(self, path: str, schema):
        import pyarrow.parquet as pq

        return pq.ParquetWriter(path, schema)


class ArrowFs:
    """A ``pyarrow.fs.FileSystem`` behind the same surface -- the
    s3a/HDFS deployment path.  Holds only the original URI; the
    filesystem object is resolved lazily (and re-resolved after
    unpickling -- pyarrow filesystems are not picklable on every
    backend)."""

    def __init__(self, uri: str) -> None:
        self._uri = uri
        self._fs = None

    def __getstate__(self):
        return {"_uri": self._uri}

    def __setstate__(self, state):
        self._uri = state["_uri"]
        self._fs = None

    @property
    def fs(self):
        if self._fs is None:
            from pyarrow.fs import FileSystem

            self._fs, _ = FileSystem.from_uri(self._uri)
        return self._fs

    def listdir_mtime(self, dirpath: str) -> "list[tuple[str, int]]":
        from pyarrow.fs import FileSelector

        out = []
        for info in self.fs.get_file_info(FileSelector(dirpath)):
            name = info.path.rsplit("/", 1)[-1]
            mt = info.mtime_ns
            out.append((name, int(mt // 1_000_000) if mt is not None else 0))
        return sorted(out)

    def _info(self, path: str):
        from pyarrow.fs import FileType

        info = self.fs.get_file_info([path])[0]
        return None if info.type == FileType.NotFound else info

    def isdir(self, path: str) -> bool:
        from pyarrow.fs import FileType

        info = self._info(path)
        return info is not None and info.type == FileType.Directory

    def exists(self, path: str) -> bool:
        return self._info(path) is not None

    def read_bytes(self, path: str) -> bytes:
        try:
            with self.fs.open_input_file(path) as f:
                return f.read()
        except (FileNotFoundError, OSError) as e:
            if self._info(path) is None:
                raise FileNotFoundError(path) from e
            raise

    def walk_files(self, root: str) -> "list[str]":
        from pyarrow.fs import FileSelector, FileType

        sel = FileSelector(root, recursive=True)
        return [
            info.path
            for info in self.fs.get_file_info(sel)
            if info.type == FileType.File
        ]

    def read_parquet(self, path: str):
        import pyarrow.parquet as pq

        return pq.read_table(path, filesystem=self.fs)

    def read_parquet_filtered(self, path: str, expr):
        import pyarrow.parquet as pq

        return pq.read_table(path, filters=expr, filesystem=self.fs)

    def read_parquet_columns(self, path: str, columns: "list[str]"):
        import pyarrow.parquet as pq

        have = set(pq.read_schema(path, filesystem=self.fs).names)
        return pq.read_table(
            path, columns=[c for c in columns if c in have],
            filesystem=self.fs,
        )

    def read_parquet_schema(self, path: str):
        import pyarrow.parquet as pq

        return pq.read_schema(path, filesystem=self.fs)

    # ---- write surface (the native manifest_sink writer) ----

    def mkdirs(self, path: str) -> None:
        self.fs.create_dir(path, recursive=True)

    def write_bytes(self, path: str, data: bytes) -> None:
        with self.fs.open_output_stream(path) as f:
            f.write(data)

    def rename(self, src: str, dst: str) -> None:
        self.fs.move(src, dst)

    def delete(self, path: str, recursive: bool = False) -> None:
        from pyarrow.fs import FileType

        info = self._info(path)
        if info is None:
            return
        if info.type == FileType.Directory:
            self.fs.delete_dir(path)
        else:
            self.fs.delete_file(path)

    def write_parquet(self, path: str, table) -> None:
        import pyarrow.parquet as pq

        pq.write_table(table, path, filesystem=self.fs)

    def parquet_writer(self, path: str, schema):
        import pyarrow.parquet as pq

        return pq.ParquetWriter(path, schema, filesystem=self.fs)


def fs_for(path: str, impl: "str | None" = None) -> "tuple[object, str]":
    """Pick the filesystem handle for ``path`` from its scheme.

    ``file://`` and scheme-less paths get :class:`LocalFs` (the path is
    stripped to a plain local path); anything else (s3://, hdfs://...)
    gets :class:`ArrowFs` with the scheme-less path
    ``FileSystem.from_uri`` reports.

    ``impl="arrow"`` forces :class:`ArrowFs` even for local paths (via
    a ``file://`` URI): the escape hatch tests and operators use to
    drive the exact code path a cloud deployment runs, on local
    storage."""
    if path.startswith("file://"):
        local = path[len("file://"):]
    elif path.startswith("file:/"):  # Hadoop-style single-slash file URI
        local = path[len("file:"):]
    elif "://" not in path:
        local = path
    else:
        from pyarrow.fs import FileSystem

        _, stripped = FileSystem.from_uri(path)
        return ArrowFs(path), stripped
    if impl == "arrow":
        import os.path as _osp

        ap = _osp.abspath(local)
        return ArrowFs(f"file://{ap}"), ap
    return LocalFs(), local
