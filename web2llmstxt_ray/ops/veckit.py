"""Shared vector-column kit: zero-copy Arrow ``list<float>`` →
numpy matrix conversion used by the ANN and dedup operators.

Kept in its own leaf module so ``ops.ann`` and ``ops.dedup`` can both
import it at module scope (worker-safe: no runtime package imports in
hot paths — code shipped to workers by value must not import the
package from disk at call time).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def vec_matrix(batch, vec_col: str) -> np.ndarray:
    """Arrow ``list<float>`` column → (n, dim) float64 matrix without a
    per-row Python conversion: flatten the list values buffer (zero-copy
    for contiguous arrays) and reshape when all rows share one length —
    ~20× faster than ``np.stack([np.asarray(v) for v in ...])``."""
    col = batch.column(vec_col) if hasattr(batch, "column") else batch
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    if len(widths) and (widths == widths[0]).all():
        # account for a possible non-zero start offset (sliced arrays)
        start = offsets[0]
        return flat[start:start + len(widths) * widths[0]].reshape(
            len(widths), widths[0])
    return np.stack([np.asarray(v, dtype=np.float64)
                     for v in arr.to_pylist()])
