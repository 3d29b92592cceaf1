"""Multi-format tabular source/sink seam.

The engine's canonical storage is partitioned Parquet (with the Lance
branch in :mod:`web2llmstxt_ray.sinks` when the library is present),
but ingestion at the edge sees CSV exports, JSONL event dumps and
Arrow IPC files. One seam maps format → the right ``ray.data`` reader
so every downstream operator is source-agnostic.

Scale notes:
- Parquet is the only format with real column pruning + row-group
  predicate pushdown; ``columns=`` is forwarded there. For CSV/JSONL
  the column projection happens in a zero-copy Arrow ``select`` batch
  pass right after the read (the bytes are already off disk — the
  point is to shed width before anything shuffles).
- All readers stream blocks; nothing here materializes.
- ``write_table`` keeps the resumable-output discipline: a directory
  of per-block files, never one giant file.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data


_EXT_FMT = {
    ".parquet": "parquet", ".pq": "parquet",
    ".csv": "csv",
    ".jsonl": "jsonl", ".json": "jsonl", ".ndjson": "jsonl",
    ".arrow": "ipc", ".ipc": "ipc", ".feather": "ipc",
}


def _sniff(path: str) -> str:
    p = path.rstrip("/")
    ext = os.path.splitext(p)[1].lower()
    if ext in _EXT_FMT:
        return _EXT_FMT[ext]
    if os.path.isdir(p):
        for name in sorted(os.listdir(p)):
            e = os.path.splitext(name)[1].lower()
            if e in _EXT_FMT:
                return _EXT_FMT[e]
    raise ValueError(f"cannot infer table format for {path!r}; "
                     f"pass fmt= explicitly")


def read_table(path: str, fmt: str = "auto",
               columns: list[str] | None = None) -> ray.data.Dataset:
    """Read a tabular file/directory as a Dataset, format-agnostic.

    ``fmt``: ``auto`` (sniff by extension) | ``parquet`` | ``csv`` |
    ``jsonl`` | ``ipc`` (Arrow IPC / Feather V2).
    ``columns`` prunes at the scan for parquet and right after the
    read (Arrow select, zero-copy) for the row-oriented formats.
    """
    if fmt == "auto":
        fmt = _sniff(path)
    if fmt == "parquet":
        return ray.data.read_parquet(path, columns=columns)
    if fmt == "csv":
        ds = ray.data.read_csv(path)
    elif fmt == "jsonl":
        ds = ray.data.read_json(path)
    elif fmt == "ipc":
        # no dedicated reader in ray.data — stream record batches per
        # file via a task-parallel read over the file list
        files = ([os.path.join(path, f) for f in sorted(os.listdir(path))
                  if os.path.splitext(f)[1].lower() in
                  (".arrow", ".ipc", ".feather")]
                 if os.path.isdir(path) else [path])

        def read_one(batch: pa.Table) -> pa.Table:
            import pyarrow.feather as feather

            tabs = [feather.read_table(p) for p in
                    batch.column("path").to_pylist()]
            return pa.concat_tables(tabs) if tabs else pa.table({})

        ds = (ray.data.from_items([{"path": p} for p in files])
              .map_batches(read_one, batch_format="pyarrow",
                           batch_size=1))
    else:
        raise ValueError(f"unknown table format {fmt!r}")
    if columns:
        cols = list(columns)
        ds = ds.map_batches(lambda t: t.select(cols),
                            batch_format="pyarrow")
    return ds


def write_table(ds: ray.data.Dataset, path: str,
                fmt: str = "parquet") -> None:
    """Write a Dataset as a directory of per-block files."""
    if fmt == "parquet":
        ds.write_parquet(path)
    elif fmt == "csv":
        ds.write_csv(path)
    elif fmt == "jsonl":
        ds.write_json(path)
    elif fmt == "ipc":
        os.makedirs(path, exist_ok=True)

        class _WriteIPC:
            def __call__(self, batch: pa.Table,
                         ctx=None) -> pa.Table:
                import uuid

                import pyarrow.feather as feather

                name = os.path.join(path, f"block-{uuid.uuid4().hex}"
                                          ".arrow")
                feather.write_feather(batch, name)
                return pa.table({"path": pa.array([name])})

        # consume the stream; collect only the tiny path manifest
        ds.map_batches(_WriteIPC(), batch_format="pyarrow",
                       batch_size=None).materialize()
    else:
        raise ValueError(f"unknown table format {fmt!r}")
