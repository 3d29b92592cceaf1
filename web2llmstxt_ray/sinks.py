"""Storage-format seam for span documents (and any row table).

The north-star input hint names Lance tables; this sandbox has no
``pylance``, so every writer in the engine uses partitioned Parquet.
This module makes the format a single argument: callers write through
:func:`write_span_docs` / read through :func:`read_span_docs` and the
branch picks Lance when the library imports, Parquet otherwise.

Formats:

- ``"parquet"`` — always available (pyarrow), one file or a Ray Data
  ``write_parquet`` directory.
- ``"lance"``  — activates iff ``import lance`` succeeds; raises a
  clear ImportError otherwise (explicit choice should fail loudly).
- ``"auto"``   — lance when importable, else parquet (the deploy-time
  default: flipping a cluster to Lance requires installing pylance,
  nothing else).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _lance_module():
    try:
        import lance  # type: ignore

        return lance
    except ImportError:
        return None


def resolve_format(fmt: str = "auto") -> str:
    """'auto' → 'lance' if pylance imports, else 'parquet'."""
    if fmt == "auto":
        return "lance" if _lance_module() else "parquet"
    if fmt not in ("parquet", "lance"):
        raise ValueError(f"unknown format: {fmt}")
    return fmt


def write_span_docs(data, path: str, fmt: str = "auto") -> str:
    """Write a span-document table (``pa.Table`` or ``ray.data.Dataset``)
    to ``path`` in the resolved format; returns the resolved format.

    Parquet: a Table writes one file (``path`` or ``path/part-0.parquet``
    when path is a directory-style target); a Dataset streams via
    ``write_parquet`` (partitioned, resumable layout).
    Lance: ``lance.write_dataset`` (a Dataset is streamed per-block via
    Arrow reader batches — never materialized on the driver).
    """
    resolved = resolve_format(fmt)
    is_dataset = hasattr(data, "write_parquet")   # ray.data.Dataset
    if resolved == "parquet":
        if is_dataset:
            data.write_parquet(path)
        else:
            target = path
            if not target.endswith(".parquet"):
                os.makedirs(target, exist_ok=True)
                target = os.path.join(target, "part-0.parquet")
            pq.write_table(data, target)
        return resolved

    lance = _lance_module()
    if lance is None:
        raise ImportError(
            "format 'lance' requested but pylance is not installed; "
            "use fmt='parquet' or fmt='auto'")
    if is_dataset:
        # stream block-wise: to_arrow_refs keeps blocks in the object
        # store; the reader hands them to lance one at a time
        import ray

        refs = data.to_arrow_refs()
        if not refs:
            return resolved
        first = ray.get(refs[0])

        def batches():
            yield from first.to_batches()
            for r in refs[1:]:
                yield from ray.get(r).to_batches()

        reader = pa.RecordBatchReader.from_batches(first.schema, batches())
        lance.write_dataset(reader, path, mode="overwrite")
    else:
        lance.write_dataset(data, path, mode="overwrite")
    return resolved


def read_span_docs(path: str, fmt: str = "auto", columns=None) -> pa.Table:
    """Read a span-document table written by :func:`write_span_docs`.
    ``auto`` sniffs the on-disk layout (a ``.lance`` dataset dir vs
    parquet files) before falling back to the import probe."""
    resolved = fmt
    if fmt == "auto":
        if os.path.isdir(path) and any(
                n.endswith(".lance") or n == "_versions"
                for n in os.listdir(path)):
            resolved = "lance"
        else:
            resolved = "parquet"
    if resolved == "parquet":
        if os.path.isdir(path):
            parts = sorted(
                os.path.join(path, f) for f in os.listdir(path)
                if f.endswith(".parquet"))
            return pa.concat_tables(
                [pq.read_table(p, columns=columns) for p in parts])
        return pq.read_table(path, columns=columns)
    lance = _lance_module()
    if lance is None:
        raise ImportError("lance dataset on disk but pylance not installed")
    return lance.dataset(path).to_table(columns=columns)
