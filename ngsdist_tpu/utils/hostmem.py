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
    # Workers read `a` directly (numpy block assignment handles strided
    # views) — a contiguity pre-pass here would serialize exactly the
    # first-touch gather this function exists to parallelize (the
    # upload23 path casts a [:, :, :2] view of the f64 tensor).
    src = a
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


def upload23_enabled(dtype) -> bool:
    """Whether host->device probability uploads drop the third genotype
    component.  The reader normalizes every triple to sum 1
    (read_data.cpp:40,98 post_prob; one-hot/uniform triples are exact),
    so p2 = 1 - p0 - p1 reconstructs on device within ~1e-7 relative —
    two orders below both the bf16x3 kernel floor (1.5e-6) and the
    EPSILON=1e-5 missing-data tolerance — for 1.5x fewer bytes over the
    host link (the e2e bottleneck on tunnel rigs, and PCIe bytes
    everywhere).  auto = f32 only: x64 runs carry the md5 bit-parity
    contract and upload all three components.  NGSDIST_UPLOAD23=0/1
    forces."""
    mode = os.environ.get("NGSDIST_UPLOAD23", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    return np.dtype(dtype) == np.float32


# Sentinel in the p0 column of 2-component upload slabs for rows that
# must expand back to the ALL-ZERO triple (a probability can never
# exceed 1, so p0 = PAD23 is unambiguous): padding rows, and data-borne
# (0,0,0) triples — text genomes consume empty lines as missing sites
# whose -BIGNEG log prefill exp()s to (0,0,0), which is otherwise
# indistinguishable from a hard-called (0,0,1) once p2 is dropped.
# All-zero triples matter twice: missing_mask classifies them missing
# (all components within EPSILON), and unweighted reductions (streamed
# block partials) rely on padded rows being inert.
PAD23 = 2.0


def pack23(P3: np.ndarray, dtype, n_rows: int | None = None,
           max_threads: int = 16, may_zero: bool = True) -> np.ndarray:
    """Pack a [S, ..., 3] normal-space probability tensor into the
    2-component upload slab [n_rows, ..., 2] (ONE threaded pass:
    cast + pad + sentinel scan), with the PAD23 sentinel on every row
    the device-side expansion must restore to all-zero: the pad tail
    (n_rows > S) and data-borne all-zero triples.  The zero-triple
    scan runs inside the cast workers on the just-written (cache-hot)
    block — a separate serial pass measured ~4.6 s at 64k x 1k.

    may_zero=False skips the scan (~30%% of the pack cost): all-zero
    triples exist ONLY in text-read genomes (the -BIGNEG prefill of
    empty-line missing sites) — every parsed row log-normalizes to
    sum 1, so binary inputs cannot produce one (callers pass
    `not pars.in_bin`).  See upload23_enabled for when callers pack."""
    dtype = np.dtype(dtype)
    S = P3.shape[0]
    rows = S if n_rows is None else n_rows
    out = np.empty((rows,) + P3.shape[1:-1] + (2,), dtype)

    def block(lo: int, hi: int) -> None:
        cp = min(hi, S)
        if lo < cp:
            blk = out[lo:cp]
            blk[...] = P3[lo:cp, ..., :2]
            if may_zero:
                # candidate mask on the SOURCE dtype (cache-hot from
                # the cast just above), not the cast block: an f64
                # triple with sub-f32-denormal p0/p1 casts to 0.0f and
                # would be falsely sentineled by an f32-side scan.
                # Confirm against the dropped component only when
                # candidates exist ((0,0,*): p2 one-hots, empty-lines)
                zz = (P3[lo:cp, ..., 0] == 0) & (P3[lo:cp, ..., 1] == 0)
                if zz.any():
                    np.logical_and(zz, P3[lo:cp, ..., 2] == 0, out=zz)
                    blk[..., 0][zz] = PAD23
        if cp < hi:
            pad = out[max(lo, S):hi]
            pad[...] = 0
            pad[..., 0] = PAD23

    nt = min(max_threads, os.cpu_count() or 1, max(1, rows))
    if P3.nbytes < _MIN_PARALLEL_BYTES or nt == 1:
        block(0, rows)
        return out
    bounds = [(w * rows) // nt for w in range(nt + 1)]
    ts = [threading.Thread(target=block, args=(bounds[w], bounds[w + 1]))
          for w in range(nt)]
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
    # Strided views are read directly by the workers (see parallel_astype).
    src = a
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
