"""Host-memory helpers for large tensor staging.

The first write to each page of a fresh allocation pays a page fault;
on para-virtualized kernels (sandboxed VMs) faults run at ~10 MB/s per
thread, so serially converting a multi-hundred-MB f64 tensor to f32
costs tens of seconds before any bytes move to the device.  Threaded
slice copies parallelize both the cast arithmetic (bandwidth-bound on
bare metal) and the first touch (fault-bound on VMs) — numpy releases
the GIL for large contiguous casts.
"""

from __future__ import annotations

import os
import threading

import numpy as np

_MIN_PARALLEL_BYTES = 1 << 25  # 32 MB: below this, thread spawn dominates


def parallel_astype(a: np.ndarray, dtype, max_threads: int = 16) -> np.ndarray:
    """`a.astype(dtype)` with threaded first-touch + cast.

    Returns `a` unchanged when it already has the target dtype (same
    semantics as np.asarray(a, dtype) — callers must not mutate).
    """
    dtype = np.dtype(dtype)
    if a.dtype == dtype:
        return a
    nt = min(max_threads, os.cpu_count() or 1)
    if a.nbytes < _MIN_PARALLEL_BYTES or nt == 1 or a.ndim == 0:
        return a.astype(dtype)
    src = np.ascontiguousarray(a)
    out = np.empty(src.shape, dtype)
    n = src.shape[0]
    nt = min(nt, n)
    bounds = [(w * n) // nt for w in range(nt + 1)]

    def worker(w: int) -> None:
        lo, hi = bounds[w], bounds[w + 1]
        out[lo:hi] = src[lo:hi]

    ts = [threading.Thread(target=worker, args=(w,)) for w in range(nt)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return out


def parallel_cast_pad(a: np.ndarray, dtype, n_rows: int,
                      max_threads: int = 16) -> np.ndarray:
    """Cast to dtype and zero-pad axis 0 to n_rows in ONE threaded pass
    (cast-then-pad would allocate and first-touch the tensor twice).

    Returns `a` unchanged when no cast and no pad is needed (callers
    must not mutate the result).
    """
    dtype = np.dtype(dtype)
    S = a.shape[0]
    if n_rows == S and a.dtype == dtype:
        return a
    nt = min(max_threads, os.cpu_count() or 1)
    out = np.empty((n_rows,) + a.shape[1:], dtype)
    if a.nbytes < _MIN_PARALLEL_BYTES or nt == 1:
        out[:S] = a
        out[S:] = 0
        return out
    src = np.ascontiguousarray(a)
    nt = min(nt, n_rows)
    bounds = [(w * n_rows) // nt for w in range(nt + 1)]

    def worker(w: int) -> None:
        lo, hi = bounds[w], bounds[w + 1]
        cp = min(hi, S)
        if lo < cp:
            out[lo:cp] = src[lo:cp]
        if cp < hi:
            out[max(lo, S):hi] = 0

    ts = [threading.Thread(target=worker, args=(w,)) for w in range(nt)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return out
