#!/usr/bin/env python
"""Headline benchmark: pair-site distance updates/sec on one chip.

Default mode measures the full-matrix computation at the BASELINE.json
shape (1k individuals x 1M sites, independent-genotypes path with
pairwise deletion) by streaming site chunks through the fused Pallas
kernel and accumulating the [N, N] sufficient statistics on device.
One JSON line:

  {"metric": "pair_site_updates_per_sec", "value": ..., "unit":
   "updates/s", "vs_baseline": ...}

vs_baseline compares against the reference ngsDist CPU engine scaled to
64 threads (BENCH_baseline.json, produced by
tests/refharness/measure_cpu_baseline.py; reference hot loop:
/root/reference/ngsDist.cpp:325-404 at 9 fused multiply-adds per
pair-site update).

Additional modes (each prints its own JSON line):

  bench.py --em    EM-path kernel (per-(pair,site) 9-cell EM to
                   convergence, ops/pallas_em.py) incl. a
                   bootstrap-weighted replicate on the SAME compiled
                   kernel; vs_baseline against the measured CPU EM rate
                   (cpu64_em_updates_per_sec).
  bench.py --e2e   the real CLI pipeline: binary-GP file -> native
                   reader -> preprocess -> device kernels -> phylip
                   writer (runner.run), reporting user-visible
                   wall-time updates/sec.

Env knobs: NGSDIST_BENCH_N_IND, NGSDIST_BENCH_N_SITES,
NGSDIST_BENCH_CHUNK override the shape (e.g. for a quick smoke run).
NGSDIST_BENCH_PLATFORM pins the jax backend post-import (the axon
sitecustomize force-sets JAX_PLATFORMS, so the env var alone cannot);
a CPU smoke run needs NGSDIST_BENCH_PLATFORM=cpu plus
NGSDIST_PALLAS=interpret (or NGSDIST_BENCH_ENGINE=einsum).
NGSDIST_BENCH_PROBE_TIMEOUT bounds the startup backend-liveness probe
(seconds, default 180, 0 = skip): a dead device tunnel fails fast with
a diagnostic instead of hanging the bench.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_FILE = os.path.join(REPO, "BENCH_baseline.json")

# The engine's kernel dispatcher reads NGSDIST_PALLAS itself; the bench
# calls the kernels directly, so honor the interpret setting here too
# (CPU smoke runs: Mosaic only lowers on TPU).
_PALLAS_INTERPRET = os.environ.get("NGSDIST_PALLAS", "") == "interpret"


def _baseline(key: str) -> float:
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as fh:
            return float(json.load(fh).get(key, 0.0))
    return 0.0


def _emit(metric: str, value: float, unit: str, baseline_key: str) -> None:
    ref = _baseline(baseline_key)
    print(json.dumps({
        "metric": metric,
        "value": value,
        "unit": unit,
        "vs_baseline": value / ref if ref > 0 else 0.0,
    }))


def main_em() -> None:
    """EM-path kernel throughput, incl. a weighted bootstrap replicate
    reusing the same compiled kernel (VERDICT round-1 item 2)."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from ngsdist_tpu.config import default_score_matrix
    from ngsdist_tpu.ops.pallas_em import em_raw_cnt_pallas

    N = int(os.environ.get("NGSDIST_BENCH_N_IND", 1024))
    S = int(os.environ.get("NGSDIST_BENCH_N_SITES", 4096))
    dev = jax.devices()[0]
    rng_key = jax.random.PRNGKey(0)
    P = jax.nn.softmax(jax.random.normal(rng_key, (S, N, 3), jnp.float32), axis=-1)
    P = jax.device_put(P, dev)
    score9 = default_score_matrix().reshape(-1)
    w = jnp.asarray(
        (jax.random.randint(jax.random.PRNGKey(1), (S,), 0, 3)).astype(jnp.float32)
    )

    def full(weights):
        raw, cnt = em_raw_cnt_pallas(P, score9, True, site_weights=weights,
                                     interpret=_PALLAS_INTERPRET)
        # Scalar barrier (no matrix fetch inside the timed region —
        # the ~0.15 s tunnel fetch is not kernel work); triu: the block
        # enumeration never writes the lower triangle, whose buffer
        # contents are undefined.
        return jnp.sum(jnp.triu(raw, 1))

    _ = np.asarray(full(None))  # compile rep-0 shape
    _ = np.asarray(full(w))     # compile the weighted (replicate) shape
    times = []
    for _i in range(3):
        t0 = time.perf_counter()
        r0 = full(None)
        r1 = full(w)          # bootstrap replicate: same kernel, new weights
        np.asarray(r0); np.asarray(r1)
        times.append((time.perf_counter() - t0) / 2)
    elapsed = min(times)
    ups = (N * (N - 1) / 2) * S / elapsed
    _emit("em_pair_site_updates_per_sec", ups, "updates/s",
          "cpu64_em_updates_per_sec")
    print(f"# EM kernel {N} ind x {S} sites, full+weighted replicate on "
          f"{dev.platform}:{dev.device_kind}", file=sys.stderr)


def main_e2e() -> None:
    """End-to-end CLI pipeline wall-time: binary GP file -> reader ->
    preprocess -> device kernels -> phylip writer (runner.run).

    Default shape is modest (256 x 64k): on this rig the pipeline is
    bound by the virtual disk (~25 MB/s cold reads with writeback
    stalls) and the remote-device tunnel upload, not by compute (the
    kernel section is ~0.04 s at this shape) — override with
    NGSDIST_BENCH_N_IND/N_SITES for the full 1k x 1M BASELINE shape.
    """
    import tempfile

    sys.path.insert(0, REPO)
    from ngsdist_tpu import runner
    from ngsdist_tpu.config import Params

    N = int(os.environ.get("NGSDIST_BENCH_N_IND", 256))
    S = int(os.environ.get("NGSDIST_BENCH_N_SITES", 1 << 16))
    rng = np.random.default_rng(7)
    with tempfile.TemporaryDirectory() as td:
        geno = os.path.join(td, "gp.bin")
        t0 = time.perf_counter()
        with open(geno, "wb") as fh:
            chunk = 1 << 16
            for s0 in range(0, S, chunk):
                n = min(chunk, S - s0)
                gp = rng.dirichlet(np.ones(3), size=(n, N))
                gp.tofile(fh)
        gen_time = time.perf_counter() - t0
        pars = Params(in_geno=geno, in_bin=True, in_probs=True,
                      n_ind=N, n_sites=S, indep_geno=True, pairwise_del=True,
                      evol_model=1, seed=1, verbose=0,
                      out=os.path.join(td, "out.dist"))
        pars.validate(); pars.finalize()
        t0 = time.perf_counter()
        runner.run(pars, engine="jax")
        elapsed = time.perf_counter() - t0
    ups = (N * (N - 1) / 2) * S / elapsed
    _emit("e2e_pair_site_updates_per_sec", ups, "updates/s",
          "cpu64_updates_per_sec")
    print(f"# e2e {N} ind x {S} sites: input gen {gen_time:.1f}s, "
          f"pipeline {elapsed:.1f}s (reader+preprocess+kernel+writer)",
          file=sys.stderr)


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from ngsdist_tpu.config import default_score_matrix
    from ngsdist_tpu.core.distance import missing_mask
    from ngsdist_tpu.ops.pallas_indep import (indep_raw_cnt_pallas,
                                              prepare_plane_major)

    engine = os.environ.get("NGSDIST_BENCH_ENGINE", "pallas")

    N = int(os.environ.get("NGSDIST_BENCH_N_IND", 1024))
    S_total = int(os.environ.get("NGSDIST_BENCH_N_SITES", 1 << 20))
    chunk = int(os.environ.get("NGSDIST_BENCH_CHUNK", 1 << 16))
    n_chunks = max(1, S_total // chunk)
    S_total = n_chunks * chunk

    dev = jax.devices()[0]
    dtype = jnp.float32

    def chunk_step(P3, score9):
        """One site-chunk's sufficient statistics through the engine's
        kernel dispatcher.  The chunk is pre-relayouted plane-major via
        prepare_plane_major — the same prepare-once-reuse-per-replicate
        call pattern core/distance.py uses (kernel-resident headline:
        replicate streams amortize the relayout, so it stays outside
        the timed loop)."""
        return indep_raw_cnt_pallas(P3, score9, True,
                                    plane_major=(chunk, N),
                                    interpret=_PALLAS_INTERPRET)

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

    # Chunks run as an asynchronously queued dispatch stream (submission
    # overlaps device execution); NBUF distinct device-resident chunks
    # cycle so no dispatch repeats the previous one.  A single fused jit
    # would let XLA CSE the repeated pallas calls down to NBUF real
    # kernels (measured 0.2 ms/"chunk" — a lie), and fetching the [N,N]
    # result through the axon tunnel costs a constant ~0.15 s that would
    # swamp the ~5 ms/chunk kernel time, so: dispatch-stream form, a
    # SCALAR checksum as the completion barrier, and differential timing
    # over two chunk counts to cancel the constant fetch latency (on
    # real PCIe hosts the 4 MB fetch is ~0.4 ms — a tunnel artifact).
    NBUF = min(4, n_chunks)

    @jax.jit
    def acc(raw, cnt, r, c):
        return raw + r, cnt + c

    @jax.jit
    def finalize(raw, cnt):
        # Pallas path fills the upper triangle; mirror for the final map.
        if engine != "einsum":
            raw = jnp.triu(raw) + jnp.triu(raw, 1).T
            cnt = jnp.triu(cnt) + jnp.triu(cnt, 1).T
        d = raw / jnp.maximum(cnt, 1)
        d = -jnp.log1p(-d) * (1 - jnp.eye(N, dtype=dtype))
        return jnp.sum(d)

    def full_matrix(bufs, score, k):
        raw = jnp.zeros((N, N), dtype)
        cnt = jnp.zeros((N, N), dtype)
        for i in range(k):
            r, c = chunk_step(bufs[i % NBUF], score)
            raw, cnt = acc(raw, cnt, r, c)
        return np.asarray(finalize(raw, cnt))  # scalar barrier

    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (NBUF, chunk, N, 3), dtype=dtype)
    P4 = jax.nn.softmax(logits, axis=-1)
    if engine == "einsum":
        bufs = [jax.device_put(P4[b], dev) for b in range(NBUF)]
    else:
        bufs = [jax.device_put(prepare_plane_major(P4[b])[0], dev)
                for b in range(NBUF)]
    score = jax.device_put(jnp.asarray(default_score_matrix(), dtype), dev)

    _ = full_matrix(bufs, score, 1)  # warmup / compile

    def tmin(k, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            full_matrix(bufs, score, k)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    k1 = max(1, n_chunks // 4)
    elapsed = tmin(n_chunks + k1) - tmin(k1)  # device time for n_chunks

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


def _apply_platform() -> None:
    """Honor NGSDIST_BENCH_PLATFORM (e.g. "cpu" for a smoke run).

    The axon sitecustomize force-sets JAX_PLATFORMS at import, so an
    env override alone cannot reach a non-default backend — apply it
    post-import via jax.config, the same mechanism as the CLI's
    --platform flag.
    """
    plat = os.environ.get("NGSDIST_BENCH_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def _probe_backend() -> None:
    """Fail fast if the device backend is unreachable.

    Backend bring-up through the axon tunnel blocks inside native code
    when the tunnel is down, so an in-process alarm cannot interrupt it
    — probe jax.devices() in a subprocess under a wall-clock bound and
    abort with a diagnostic instead of hanging the bench indefinitely.
    NGSDIST_BENCH_PROBE_TIMEOUT (seconds) overrides the bound; 0 skips
    the probe.
    """
    import subprocess

    timeout = float(os.environ.get("NGSDIST_BENCH_PROBE_TIMEOUT", "180"))
    if timeout <= 0:
        return
    code = (
        "import os, jax\n"
        "plat = os.environ.get('NGSDIST_BENCH_PLATFORM')\n"
        "if plat: jax.config.update('jax_platforms', plat)\n"
        "print(jax.devices()[0].platform)\n"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        print(
            f"# bench: device backend unreachable (jax.devices() did not "
            f"return within {timeout:.0f}s) — is the TPU tunnel up?",
            file=sys.stderr,
        )
        sys.exit(2)
    if proc.returncode != 0:
        print(
            "# bench: device backend failed to initialize:\n"
            + proc.stderr.strip(),
            file=sys.stderr,
        )
        sys.exit(2)


if __name__ == "__main__":
    _probe_backend()
    _apply_platform()
    if "--em" in sys.argv:
        main_em()
    elif "--e2e" in sys.argv:
        main_e2e()
    else:
        main()
