"""Arrow ↔ numpy bridging helpers for vector (``list<float>``) columns.

The naive ``np.stack(col.to_pylist())`` round-trips every element
through a Python list (measured: the dominant cost of the embedding
pipelines at sf0.1); for fixed-length list columns the values buffer is
already the (n × d) matrix — reshape it without touching Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def ids_np(col) -> np.ndarray:
    """1-D numpy array of an id column without a ``to_pylist`` detour —
    zero-copy for null-free numeric columns (int64 ids measured ~20×
    faster per batch); strings come back as an object array built at C
    level, same layout ``np.asarray(to_pylist())`` would produce."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if arr.null_count:
        # to_numpy would silently promote a nullable int64 id column to
        # float64-with-NaN (ids become 5.0-style floats in pair tables);
        # ids are expected non-null everywhere this helper is used.
        raise ValueError("ids_np: null values in id column")
    return arr.to_numpy(zero_copy_only=False)


def list_col_to_matrix(col, dtype=np.float64) -> np.ndarray:
    """(n, d) matrix from a fixed-length ``list<float>`` column —
    zero-copy from the Arrow values buffer (plus one cast if the stored
    dtype differs). Raises on ragged rows or null entries (embeddings
    are dense by construction; a silent mis-reshape would scramble
    every row after the first ragged one)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if arr.null_count:
        raise ValueError("list_col_to_matrix: null rows in vector column")
    vals = arr.flatten().to_numpy(zero_copy_only=False)
    if len(vals) % n:
        raise ValueError(
            f"list_col_to_matrix: ragged list column ({len(vals)} values "
            f"across {n} rows)")
    return vals.reshape(n, -1).astype(dtype, copy=False)
