#!/usr/bin/env python
"""Headline benchmark: pair-site distance updates/sec on one chip.

Measures the full-matrix computation at the BASELINE.json shape
(1k individuals x 1M sites, independent-genotypes path with pairwise
deletion) by streaming site chunks through the jitted einsum engine and
accumulating the [N, N] sufficient statistics on device.  One JSON line:

  {"metric": "pair_site_updates_per_sec", "value": ..., "unit":
   "updates/s", "vs_baseline": ...}

vs_baseline compares against the reference ngsDist CPU engine scaled to
64 threads (BENCH_baseline.json, produced by
tests/refharness/measure_cpu_baseline.py; reference hot loop:
/root/reference/ngsDist.cpp:325-404 at 9 fused multiply-adds per
pair-site update).

Env knobs: NGSDIST_BENCH_N_IND, NGSDIST_BENCH_N_SITES,
NGSDIST_BENCH_CHUNK override the shape (e.g. for a quick smoke run).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_FILE = os.path.join(REPO, "BENCH_baseline.json")


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from ngsdist_tpu.config import default_score_matrix
    from ngsdist_tpu.core.distance import missing_mask
    from ngsdist_tpu.ops.pallas_indep import _indep_pallas_padded, _upper_blocks

    engine = os.environ.get("NGSDIST_BENCH_ENGINE", "pallas")

    N = int(os.environ.get("NGSDIST_BENCH_N_IND", 1024))
    S_total = int(os.environ.get("NGSDIST_BENCH_N_SITES", 1 << 20))
    chunk = int(os.environ.get("NGSDIST_BENCH_CHUNK", 1 << 16))
    n_chunks = max(1, S_total // chunk)
    S_total = n_chunks * chunk

    dev = jax.devices()[0]
    dtype = jnp.float32

    SITE_TILE = 512
    IB, JB = _upper_blocks(N // 128)
    IBj, JBj = jnp.asarray(IB), jnp.asarray(JB)

    def chunk_step(P3, score9):
        """One site-chunk's sufficient statistics via the fused
        upper-triangular Pallas kernel (P3 plane-major [3, chunk, N])."""
        return _indep_pallas_padded(
            P3, score9, IBj, JBj, True, 128, SITE_TILE, False
        )

    @jax.jit
    def chunk_step_einsum(P, score):
        valid = (~missing_mask(P)).astype(dtype)
        Q = P * valid[..., None]
        Y = jnp.einsum("sjh,gh->sjg", Q, score)
        raw = jnp.einsum("sig,sjg->ij", Q, Y, preferred_element_type=dtype)
        cnt = jnp.einsum("si,sj->ij", valid, valid, preferred_element_type=dtype)
        return raw, cnt

    if engine == "einsum":
        chunk_step = chunk_step_einsum

    # Site chunks stream as asynchronously queued dispatches (jax
    # dispatch is async; the single np.asarray at the end is the
    # completion barrier — also the only reliable one through the
    # remote-device tunnel).  NBUF distinct device-resident chunks cycle
    # so no dispatch is a duplicate of the previous one.
    NBUF = min(4, n_chunks)

    @jax.jit
    def finalize(raw, cnt):
        # Pallas path fills the upper triangle; mirror for the final map.
        if engine != "einsum":
            raw = jnp.triu(raw) + jnp.triu(raw, 1).T
            cnt = jnp.triu(cnt) + jnp.triu(cnt, 1).T
        d = raw / jnp.maximum(cnt, 1)
        return -jnp.log1p(-d) * (1 - jnp.eye(N, dtype=dtype))

    @jax.jit
    def acc(raw, cnt, r, c):
        return raw + r, cnt + c

    def full_matrix(bufs, score):
        raw = jnp.zeros((N, N), dtype)
        cnt = jnp.zeros((N, N), dtype)
        for i in range(n_chunks):
            r, c = chunk_step(bufs[i % NBUF], score)
            raw, cnt = acc(raw, cnt, r, c)
        return finalize(raw, cnt)

    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (NBUF, chunk, N, 3), dtype=dtype)
    P4 = jax.nn.softmax(logits, axis=-1)
    if engine != "einsum":
        P4 = jnp.moveaxis(P4, -1, 1)  # [NBUF, 3, chunk, N] plane-major
    bufs = [jax.device_put(P4[b], dev) for b in range(NBUF)]
    score_m = jnp.asarray(default_score_matrix(), dtype)
    score = jax.device_put(
        score_m if engine == "einsum" else score_m.reshape(1, 9), dev
    )

    _ = np.asarray(full_matrix(bufs, score))  # warmup / compile

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        d = np.asarray(full_matrix(bufs, score))
        times.append(time.perf_counter() - t0)
    elapsed = min(times)

    n_pairs = N * (N - 1) // 2
    updates = float(n_pairs) * float(S_total)
    rate = updates / elapsed

    vs = 0.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as fh:
            base = json.load(fh)
        ref = float(base.get("cpu64_updates_per_sec", 0.0))
        if ref > 0:
            vs = rate / ref

    print(json.dumps({
        "metric": "pair_site_updates_per_sec",
        "value": rate,
        "unit": "updates/s",
        "vs_baseline": vs,
    }))
    print(
        f"# {N} ind x {S_total} sites ({n_chunks} chunks of {chunk}) in "
        f"{elapsed:.3f}s on {dev.platform}:{dev.device_kind}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
