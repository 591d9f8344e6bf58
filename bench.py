#!/usr/bin/env python
"""Headline benchmarks: pair-site distance updates/sec on one chip.

The DEFAULT invocation (what the driver runs) measures ALL headline
metrics, each against its reference-CPU anchor in BENCH_baseline.json
(produced by tests/refharness/measure_cpu_baseline.py):

  indep  full-matrix sufficient statistics at the BASELINE.json shape
         (1k individuals x 1M sites, independent-genotypes path with
         pairwise deletion) streamed through the fused Pallas kernel
         [reference hot loop /root/reference/ngsDist.cpp:325-404,
         9 fused multiply-adds per pair-site update]
  em     EM-path kernel (per-(pair,site) 9-cell EM to convergence,
         ops/pallas_em.py) incl. a bootstrap-weighted replicate on the
         SAME compiled kernel [reference emOptim2.cpp:77-135]
  e2e    the real CLI pipeline: binary-GP file -> native reader ->
         preprocess -> device kernels -> phylip writer (runner.run),
         user-visible wall-time updates/sec

and prints ONE combined JSON line whose top-level metric is the indep
headline, with the other modes under "metrics":

  {"metric": "pair_site_updates_per_sec", "value": N, "unit":
   "updates/s", "vs_baseline": N, "metrics": {"em": {...}, "e2e":
   {...}}}

A mode that fails records {"error": ...} under "metrics" and does not
sink the run; the headline falls back to the first mode that succeeded.

Single-mode runs (bench.py --indep | --em | --e2e) print that mode's
JSON line alone, as before.

Env knobs: NGSDIST_BENCH_N_IND, NGSDIST_BENCH_N_SITES,
NGSDIST_BENCH_CHUNK override the shape (e.g. for a quick smoke run).
NGSDIST_BENCH_PLATFORM pins the jax backend post-import (the axon
sitecustomize force-sets JAX_PLATFORMS, so the env var alone cannot);
a CPU smoke run needs NGSDIST_BENCH_PLATFORM=cpu plus
NGSDIST_PALLAS=interpret (or NGSDIST_BENCH_ENGINE=einsum).
NGSDIST_BENCH_PROBE_TIMEOUT bounds the TOTAL startup backend-liveness
probe window (seconds, default 600, 0 = skip): the probe RETRIES a
dead device tunnel with backoff until the window expires — a flaky
tunnel at capture time must not cost the round's perf evidence
(BENCH_r02 lesson) — and reports the failing stage when it gives up.
NGSDIST_BENCH_BUDGET (seconds, default 1100 — sized to the driver's
observed ~1200s capture window, BENCH_r04 lesson) bounds the default
invocation's total wall time: modes still pending when it trips are
recorded as skipped rather than run, and a mode whose ESTIMATED cost
exceeds the remaining budget is skipped up front rather than started.
NGSDIST_BENCH_CACHE points at the generated-input cache directory
(default /dev/shm/ngsdist_bench_cache): inputs are keyed by
(N, S, seed) and reused across modes AND invocations, so the ~690s of
input generation that starved the round-4 driver capture (rc 124,
parsed null) is paid at most once per machine boot.  The combined JSON
line is ALSO emitted incrementally after every mode (last line wins),
so a captured-under-timeout run still leaves a parseable record.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import tempfile
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


def _record(metric: str, value: float, unit: str, baseline_key: str) -> dict:
    ref = _baseline(baseline_key)
    return {
        "metric": metric,
        "value": value,
        "unit": unit,
        "vs_baseline": value / ref if ref > 0 else 0.0,
    }


def main_em() -> dict:
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
    print(f"# EM kernel {N} ind x {S} sites, full+weighted replicate on "
          f"{dev.platform}:{dev.device_kind}", file=sys.stderr)
    return _record("em_pair_site_updates_per_sec", ups, "updates/s",
                   "cpu64_em_updates_per_sec")


def _cache_dir() -> str:
    """Generated-input cache.  /dev/shm by default: this rig's virtual
    disk writes at ~25 MB/s with writeback stalls, and the cache is
    what keeps the driver's capture window affordable — inputs persist
    across bench invocations until reboot."""
    d = os.environ.get("NGSDIST_BENCH_CACHE")
    if not d:
        d = ("/dev/shm/ngsdist_bench_cache"
             if os.access("/dev/shm", os.W_OK) else
             os.path.join(tempfile.gettempdir(), "ngsdist_bench_cache"))
    os.makedirs(d, exist_ok=True)
    return d


def _get_gp_bin(N: int, S: int, seed: int = 7) -> tuple[str, float]:
    """Return (path, gen_seconds) for the [S, N, 3] binary GP input at
    this shape, generating into the cache only on a miss.  Generation
    is deterministic in (N, S, seed), so a cached file is byte-exact
    for every mode sharing the shape (e2e and e2e_cg share 1024x64k).
    Written via tmp+rename so a killed run never caches a short file."""
    path = os.path.join(_cache_dir(), f"gp_{N}x{S}_s{seed}.bin")
    want = S * N * 24
    if os.path.exists(path) and os.path.getsize(path) == want:
        return path, 0.0
    tmp = path + ".tmp"
    dt = _gen_gp_bin(tmp, N, S, seed)
    os.replace(tmp, path)
    return path, dt


def _gen_gp_bin(path: str, N: int, S: int, seed: int = 7) -> float:
    """Write an [S, N, 3] Dirichlet(1,1,1) binary GP file.  Large files
    tile one random 64k-site block byte-wise (content does not affect
    indep-path timing; generation would otherwise dominate the mode)."""
    rng = np.random.default_rng(seed)
    t0 = time.perf_counter()
    block_sites = min(S, 1 << 16)
    chunk = 1 << 14
    parts = []
    for s0 in range(0, block_sites, chunk):
        n = min(chunk, block_sites - s0)
        # Dirichlet(1,1,1) via normalized exponentials — same
        # distribution as rng.dirichlet, ~40x faster
        g = rng.exponential(size=(n, N, 3))
        g /= g.sum(axis=-1, keepdims=True)
        parts.append(g.tobytes())
    block = b"".join(parts)
    full, rem = divmod(S, block_sites)
    # threaded pwrite: serial writes page-fault at ~10 MB/s/thread on
    # this sandbox (first touch of fresh tmpfs pages), so a 26 GB input
    # would cost minutes of the bench budget single-threaded
    import threading

    fd = os.open(path, os.O_CREAT | os.O_TRUNC | os.O_WRONLY, 0o644)
    try:
        os.truncate(fd, S * N * 24)

        def write_at(i):
            os.pwrite(fd, block, i * len(block))

        kmax = full + (1 if rem else 0)
        idx = iter(range(kmax))
        lock = threading.Lock()

        def worker():
            while True:
                with lock:
                    k = next(idx, None)
                if k is None:
                    return
                if k < full:
                    write_at(k)
                else:
                    os.pwrite(fd, block[: rem * N * 24], full * len(block))

        ts = [threading.Thread(target=worker) for _ in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    finally:
        os.close(fd)
    return time.perf_counter() - t0


def _tunnel_probe(n_bytes: int = 128 << 20) -> float:
    """Host->device copy bandwidth (MB/s) measured NOW: one warm
    device_put of random f32 bytes with a completion barrier.  On
    tunnel rigs this is the e2e wall-time floor; on PCIe hosts it is
    GB/s and the floor is the reader."""
    import jax

    a = np.random.default_rng(11).random(n_bytes // 8).astype(np.float32)
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        x = jax.device_put(a)
        np.asarray(x[:1])
        dt = time.perf_counter() - t0
        del x
        best = max(best, a.nbytes / dt / (1 << 20))
    return best


def _floor_fields(rec: dict, warm: float, upload_bytes: int) -> None:
    """Attach the measured-at-capture-time transfer floor so the warm
    number is attributable: residual_s is everything that is NOT the
    host->device copy (reader beyond overlap, kernels, writer)."""
    bw = _tunnel_probe()
    floor = upload_bytes / (bw * (1 << 20))
    rec["upload_bytes"] = upload_bytes
    rec["tunnel_mbps"] = round(bw, 1)
    rec["tunnel_floor_s"] = round(floor, 3)
    rec["residual_s"] = round(warm - floor, 3)
    print(f"#   host->device link {bw:.0f} MB/s -> copy floor "
          f"{floor:.1f}s of {warm:.1f}s warm (residual "
          f"{warm - floor:.1f}s = reader-beyond-overlap+kernel+writer)",
          file=sys.stderr)


def _e2e_pars(geno, N, S, out, **kw):
    from ngsdist_tpu.config import Params

    kw.setdefault("seed", 1)
    kw.setdefault("indep_geno", True)
    pars = Params(in_geno=geno, in_bin=True, in_probs=True,
                  n_ind=N, n_sites=S,
                  pairwise_del=True, evol_model=1, verbose=0,
                  out=out, **kw)
    pars.validate(); pars.finalize()
    return pars


def main_e2e() -> dict:
    """End-to-end CLI pipeline wall-time: binary GP file -> fused
    native reader -> device kernels -> phylip writer (runner.run).

    Default shape 1024 x 64k: large enough that the O(N^2 S) distance
    compute amortizes the O(N S) IO (at 256 ind the pipeline is pure
    reader/upload).  The input lives on tmpfs — this rig's virtual
    disk stalls at ~25 MB/s with writeback hiccups, which benchmarks
    the sandbox's disk, not the framework.  The pipeline runs 5 times:
    the cold run pays first-ever compiles (amortized in production by
    the persistent XLA compile cache, utils/compile_cache), and the
    headline is the MIN of the 4 post-compile runs with the median and
    every sample recorded — the tunnel's copy bandwidth fluctuates
    minute-to-minute, so round-over-round deltas need the distribution
    (VERDICT r03 items 1, 7).  Override the shape with
    NGSDIST_BENCH_N_IND/N_SITES.
    """
    import shutil

    sys.path.insert(0, REPO)
    from ngsdist_tpu import runner

    N = int(os.environ.get("NGSDIST_BENCH_N_IND", 1024))
    S = int(os.environ.get("NGSDIST_BENCH_N_SITES", 1 << 16))
    base = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    geno, gen_time = _get_gp_bin(N, S)
    td = tempfile.mkdtemp(dir=base)
    try:
        times = []
        for it in range(5):
            pars = _e2e_pars(geno, N, S, os.path.join(td, f"out{it}.dist"))
            t0 = time.perf_counter()
            runner.run(pars, engine="jax")
            times.append(time.perf_counter() - t0)
            if it >= 1 and _deadline_passed():
                break
    finally:
        shutil.rmtree(td, ignore_errors=True)
    cold, post = times[0], sorted(times[1:])
    warm = post[0]
    med = post[(len(post) - 1) // 2]
    ups = (N * (N - 1) / 2) * S / warm
    print(f"# e2e {N} ind x {S} sites: input gen {gen_time:.1f}s, "
          f"pipeline cold {cold:.1f}s / warm min {warm:.1f}s "
          f"median {med:.1f}s (fused reader+kernel+writer)",
          file=sys.stderr)
    rec = _record("e2e_pair_site_updates_per_sec", ups, "updates/s",
                  "cpu64_updates_per_sec")
    rec["cold_s"] = round(cold, 3)
    rec["warm_s"] = round(warm, 3)
    rec["warm_median_s"] = round(med, 3)
    rec["samples_s"] = [round(t, 3) for t in times]
    _floor_fields(rec, warm, S * N * _bytes_per_triple())
    return rec


def _bytes_per_triple() -> int:
    """Host-link bytes per genotype triple on the f32 engine path:
    4 (uint16 fixed-point lane, NGSDIST_UPLOAD16 auto-on for device
    backends), 8 (packed f32 2-component) or 12 (full f32 triple)."""
    from ngsdist_tpu.utils.hostmem import upload16_enabled, upload23_enabled

    if upload16_enabled(np.float32):
        return 4
    return 8 if upload23_enabled(np.float32) else 12


def main_e2e_cg() -> dict:
    """Coded-upload end-to-end: --call_geno on binary GP hard-calls
    every non-missing triple (gen_func.cpp:886-914 with default
    thresholds), so the engine ships uint8 codes + a lookup table —
    1 byte per (site, individual) over the host link instead of the
    8-byte packed f32 slab (hostmem.derive_codes, NGSDIST_CODED_UPLOAD).
    Same shape as the headline e2e; 3 runs (cold + 2), min reported."""
    import shutil

    sys.path.insert(0, REPO)
    from ngsdist_tpu import runner

    N = int(os.environ.get("NGSDIST_BENCH_N_IND", 1024))
    S = int(os.environ.get("NGSDIST_BENCH_N_SITES", 1 << 16))
    base = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    geno, gen_time = _get_gp_bin(N, S)
    td = tempfile.mkdtemp(dir=base)
    try:
        times = []
        for it in range(3):
            pars = _e2e_pars(geno, N, S, os.path.join(td, f"out{it}.dist"),
                             call_geno=True)
            t0 = time.perf_counter()
            runner.run(pars, engine="jax")
            times.append(time.perf_counter() - t0)
            if it >= 1 and _deadline_passed():
                break
    finally:
        shutil.rmtree(td, ignore_errors=True)
    warm = min(times[1:]) if len(times) > 1 else times[0]
    ups = (N * (N - 1) / 2) * S / warm
    print(f"# e2e-cg {N} ind x {S} sites (--call_geno, coded uint8 "
          f"uploads): input gen {gen_time:.1f}s, pipeline "
          f"{'/'.join(f'{t:.1f}' for t in times)}s", file=sys.stderr)
    rec = _record("cg_e2e_pair_site_updates_per_sec", ups, "updates/s",
                  "cpu64_updates_per_sec")
    rec["samples_s"] = [round(t, 3) for t in times]
    _floor_fields(rec, warm, S * N)  # 1 byte per (site, ind)
    return rec


def main_e2e_1m() -> dict:
    """The BASELINE.json headline shape end-to-end: 1k individuals x 1M
    sites (25.8 GB binary GP) through the real CLI pipeline.  The f32
    working set (12.9 GB) exceeds NGSDIST_DEVICE_BUDGET/3, so this
    exercises the CHUNKED stream: fused packed reads from disk
    overlapping the async host->device copy per chunk — no resident
    host tensor at any point.  One timed run (a second if the wall
    budget allows; min reported) — the compile cache makes reruns
    equivalent to warm runs at this chunk shape."""
    import shutil

    sys.path.insert(0, REPO)
    from ngsdist_tpu import runner

    N = int(os.environ.get("NGSDIST_BENCH_N_IND", 1024))
    S = int(os.environ.get("NGSDIST_BENCH_1M_SITES", 1 << 20))
    base = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    geno, gen_time = _get_gp_bin(N, S)
    td = tempfile.mkdtemp(dir=base)
    try:
        print(f"# e2e-1M: input ready ({gen_time:.0f}s), starting runs",
              file=sys.stderr, flush=True)
        runs = int(os.environ.get("NGSDIST_BENCH_1M_RUNS", "2"))
        times = []
        for it in range(runs):
            pars = _e2e_pars(geno, N, S, os.path.join(td, f"out{it}.dist"))
            t0 = time.perf_counter()
            runner.run(pars, engine="jax")
            times.append(time.perf_counter() - t0)
            print(f"# e2e-1M: run {it} {times[-1]:.0f}s", file=sys.stderr,
                  flush=True)
            # A repeat run costs ~the first (compile cache makes run 0
            # warm); only take it when it clearly fits what's left.
            if _DEADLINE is not None and \
                    time.perf_counter() + 1.1 * times[-1] > _DEADLINE:
                break
    finally:
        shutil.rmtree(td, ignore_errors=True)
    warm = min(times)
    ups = (N * (N - 1) / 2) * S / warm
    print(f"# e2e-1M {N} ind x {S} sites (chunked fused stream): input "
          f"gen {gen_time:.1f}s, pipeline {'/'.join(f'{t:.1f}' for t in times)}s",
          file=sys.stderr)
    rec = _record("e2e_1m_pair_site_updates_per_sec", ups, "updates/s",
                  "cpu64_updates_per_sec")
    rec["elapsed_s"] = round(warm, 3)
    rec["samples_s"] = [round(t, 3) for t in times]
    _floor_fields(rec, warm, S * N * _bytes_per_triple())
    return rec


def main_boot() -> dict:
    """Bootstrap-at-scale end-to-end (BASELINE.json config 4 shape
    class: --n_boot_rep 100 --boot_block_size 5): 101 matrices through
    the real CLI pipeline at 1024 x 256k.  The partial-sum tensor would
    be 440 GB at block size 5, so this measures the weighted-replicate
    path: ONE upload of the resident device tensor, then every
    replicate reuses the SAME compiled Pallas kernel with streamed
    per-site multiplicity weights (no gather, no re-upload) — where the
    reference recomputes 101 full passes (ngsDist.cpp:217-289).
    updates/s counts the reference-equivalent work: n_pairs * (S +
    100 * n_trunc)."""
    import shutil

    sys.path.insert(0, REPO)
    from ngsdist_tpu import runner

    N = int(os.environ.get("NGSDIST_BENCH_N_IND", 1024))
    S = int(os.environ.get("NGSDIST_BENCH_BOOT_SITES", 1 << 18))
    reps, bs = 100, 5
    base = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    geno, gen_time = _get_gp_bin(N, S)
    td = tempfile.mkdtemp(dir=base)
    try:
        pars = _e2e_pars(geno, N, S, os.path.join(td, "out.dist"),
                         n_boot_rep=reps, boot_block_size=bs, seed=5)
        t0 = time.perf_counter()
        runner.run(pars, engine="jax")
        elapsed = time.perf_counter() - t0
    finally:
        shutil.rmtree(td, ignore_errors=True)
    n_trunc = S - S % bs
    updates = (N * (N - 1) / 2) * (S + reps * n_trunc)
    ups = updates / elapsed
    print(f"# bootstrap e2e {N} ind x {S} sites, {reps} reps block {bs}: "
          f"input gen {gen_time:.1f}s, 101 matrices in {elapsed:.1f}s "
          f"(one upload, weighted kernel replicates)", file=sys.stderr)
    rec = _record("boot_e2e_pair_site_updates_per_sec", ups, "updates/s",
                  "cpu64_updates_per_sec")
    rec["elapsed_s"] = round(elapsed, 3)
    rec["n_matrices"] = reps + 1
    return rec


def main_e2e_em() -> dict:
    """EM-path (non-independent genotypes) end-to-end: binary GP file ->
    fused reader -> per-(pair,site) EM Pallas kernel -> phylip writer.
    Unlike the indep e2e — whose kernel is so fast the wall-time is
    ~100% the rig's tunneled host->device copy — the EM e2e is
    COMPUTE-bound (kernel ~2.1e9 upd/s vs the CPU's 4.1e7), so this
    line shows the engine through the tunnel rather than the tunnel.
    Shape 1024 x 16k: ~8.6e9 EM problems, ~4 s device compute vs ~3 s
    upload.  Reference path: ngsDist.cpp:348-349 (em2 per site) under
    the default !indep_geno."""
    import shutil

    sys.path.insert(0, REPO)
    from ngsdist_tpu import runner

    N = int(os.environ.get("NGSDIST_BENCH_N_IND", 1024))
    S = int(os.environ.get("NGSDIST_BENCH_EM_E2E_SITES", 1 << 14))
    base = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    geno, gen_time = _get_gp_bin(N, S)
    td = tempfile.mkdtemp(dir=base)
    try:
        times = []
        for it in range(5):
            pars = _e2e_pars(geno, N, S, os.path.join(td, f"out{it}.dist"),
                             indep_geno=False)
            t0 = time.perf_counter()
            runner.run(pars, engine="jax")
            times.append(time.perf_counter() - t0)
            if it >= 2 and _deadline_passed():
                break
    finally:
        shutil.rmtree(td, ignore_errors=True)
    cold, post = times[0], sorted(times[1:])
    warm = post[0]
    med = post[(len(post) - 1) // 2]
    ups = (N * (N - 1) / 2) * S / warm
    print(f"# EM e2e {N} ind x {S} sites: input gen {gen_time:.1f}s, "
          f"pipeline cold {cold:.1f}s / warm min {warm:.1f}s median "
          f"{med:.1f}s (EM kernel compute-bound)", file=sys.stderr)
    rec = _record("em_e2e_pair_site_updates_per_sec", ups, "updates/s",
                  "cpu64_em_updates_per_sec")
    rec["cold_s"] = round(cold, 3)
    rec["warm_s"] = round(warm, 3)
    rec["warm_median_s"] = round(med, 3)
    rec["samples_s"] = [round(t, 3) for t in times]
    _floor_fields(rec, warm, S * N * _bytes_per_triple())
    rec["parts"] = _em_e2e_attribution(geno, N, S)
    print(f"#   EM e2e parts: {rec['parts']}", file=sys.stderr)
    return rec


def _em_e2e_attribution(geno: str, N: int, S: int) -> dict:
    """Decompose the EM e2e warm wall-time into its pipeline components
    (VERDICT r04 item 5 — 'reader-beyond-overlap + kernel + writer' is
    a bucket, not an attribution).  Each component is timed in
    isolation at the run's exact shape: fused disk read+parse, the
    host->device upload with a completion barrier, the EM Pallas kernel
    on the resident expanded tensor, and the %.10f phylip writer.  The
    components overlap in the real pipeline, so warm_s < sum(parts) is
    expected — `overlap_s` records how much the stream actually hid."""
    import jax
    import jax.numpy as jnp

    from ngsdist_tpu.config import Params, default_score_matrix
    from ngsdist_tpu.core import distance as dist
    from ngsdist_tpu.io import readers, writers
    from ngsdist_tpu.ops.pallas_em import em_raw_cnt_pallas

    parts = {}
    pars = Params(in_geno=geno, in_bin=True, in_probs=True, n_ind=N,
                  n_sites=S, evol_model=1, verbose=0, out="x", seed=1)
    src = readers.PackedBinInput(pars)
    t0 = time.perf_counter()
    buf = src.read_packed(0, S)
    parts["read_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    dbuf = jax.device_put(buf)
    np.asarray(dbuf[:1, :1])
    parts["upload_s"] = round(time.perf_counter() - t0, 3)

    P = dist.expand23(dbuf)
    np.asarray(P[:1, :1])
    score9 = jnp.asarray(default_score_matrix().reshape(-1), jnp.float32)

    def kern():
        raw, cnt = em_raw_cnt_pallas(P, score9, True,
                                     interpret=_PALLAS_INTERPRET)
        return np.asarray(jnp.sum(jnp.triu(raw, 1)))

    kern()  # compile at THIS shape (cached for later runs)
    t0 = time.perf_counter()
    kern()
    parts["kernel_s"] = round(time.perf_counter() - t0, 3)

    D = np.random.default_rng(0).random((N, N))
    D = np.triu(D, 1) + np.triu(D, 1).T
    labels = [f"Ind_{i}" for i in range(N)]
    outp = os.path.join(tempfile.gettempdir(), "attr.dist")
    t0 = time.perf_counter()
    with open(outp, "w") as fh:
        writers.write_dist_matrix(fh, labels, D)
    parts["writer_s"] = round(time.perf_counter() - t0, 3)
    os.unlink(outp)
    return parts


def main_indep() -> dict:
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

    def full_matrix_stream(bufs, score, k):
        raw = jnp.zeros((N, N), dtype)
        cnt = jnp.zeros((N, N), dtype)
        for i in range(k):
            r, c = chunk_step(bufs[i % NBUF], score)
            raw, cnt = acc(raw, cnt, r, c)
        return np.asarray(finalize(raw, cnt))  # scalar barrier

    # Default timing harness: the WHOLE k-chunk loop is one
    # lax.scan dispatch (body indexes a stacked [NBUF, ...] tensor via
    # the loop counter — runtime-dependent inputs, so XLA cannot CSE
    # the repeated kernel the way identical-operand calls in one jit
    # were CSE'd to NBUF executions).  One dispatch + one scalar fetch
    # per measurement makes the headline insensitive to the tunnel's
    # dispatch latency: the eager stream form underreported the kernel
    # 40%+ whenever the link degraded below ~15 MB/s (round-5), since
    # ~15 ms/dispatch round-trips starved the device.
    # NGSDIST_BENCH_DISPATCH=stream restores the old form.
    use_scan = os.environ.get("NGSDIST_BENCH_DISPATCH", "scan") != "stream"

    @functools.partial(jax.jit, static_argnames=("k",))
    def full_matrix_scan(bufs_t, score, k):
        # lax.switch over per-buffer closures, NOT a dynamic_index
        # gather of a stacked tensor: the gather materializes an
        # 800 MB chunk copy per step (~2 ms of HBM traffic against a
        # ~5 ms kernel — measured 30% headline loss).
        def body(carry, i):
            raw, cnt = carry
            r, c = jax.lax.switch(
                i % NBUF,
                [functools.partial(chunk_step, bufs_t[b], score)
                 for b in range(NBUF)])
            return (raw + r, cnt + c), 0
        (raw, cnt), _ = jax.lax.scan(
            body, (jnp.zeros((N, N), dtype), jnp.zeros((N, N), dtype)),
            jnp.arange(k, dtype=jnp.int32))
        return finalize(raw, cnt)

    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (NBUF, chunk, N, 3), dtype=dtype)
    P4 = jax.nn.softmax(logits, axis=-1)
    if engine == "einsum":
        bufs = [jax.device_put(P4[b], dev) for b in range(NBUF)]
    else:
        bufs = [jax.device_put(prepare_plane_major(P4[b])[0], dev)
                for b in range(NBUF)]
    score = jax.device_put(jnp.asarray(default_score_matrix(), dtype), dev)
    bufs_t = tuple(bufs) if use_scan else None

    def full_matrix(bufs, score, k):
        if use_scan:
            return np.asarray(full_matrix_scan(bufs_t, score, k))
        return full_matrix_stream(bufs, score, k)

    _ = full_matrix(bufs, score, 1)  # warmup / compile

    def tmin(k, n=3):
        full_matrix(bufs, score, k)  # compile this k (scan: static arg)
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

    print(
        f"# {N} ind x {S_total} sites ({n_chunks} chunks of {chunk}) in "
        f"{elapsed:.3f}s on {dev.platform}:{dev.device_kind}",
        file=sys.stderr,
    )
    return _record("pair_site_updates_per_sec", rate, "updates/s",
                   "cpu64_updates_per_sec")


# e2e1m goes LAST: it is the budget hog (25.8 GB input gen + >4 min
# samples) and routinely overruns NGSDIST_BENCH_BUDGET — any mode after
# it gets skipped, which starved e2e_cg out of early round-4 artifacts.
_MODES = [("indep", main_indep), ("em", main_em), ("e2e", main_e2e),
          ("e2e_em", main_e2e_em), ("e2e_cg", main_e2e_cg),
          ("boot", main_boot), ("e2e1m", main_e2e_1m)]

# Soft deadline shared with modes that can trim optional extra trials
# (set by main_all from NGSDIST_BENCH_BUDGET; single-mode runs have none).
_DEADLINE: float | None = None


def _deadline_passed() -> bool:
    return _DEADLINE is not None and time.perf_counter() > _DEADLINE


# Per-mode wall-time estimates with a WARM input cache: a fixed
# non-upload part (compute, dispatch, reads) plus the mode's total
# host->device upload bytes divided by the link rate MEASURED at
# invocation start — the tunnel swings 7-45 MB/s on minute timescales,
# so a fixed estimate under-budgets degraded links by 5x.  Input
# generation cost is added separately on a cache miss.  Used only to
# decide whether a mode still fits the remaining budget — starting a
# ~600 s mode with 100 s left is how round 4 blew the driver's window.
_EST_FIXED = {"indep": 90, "em": 40, "e2e": 25, "e2e_em": 70,
              "e2e_cg": 20, "boot": 140, "e2e1m": 140}
# upload traffic per mode at the uint16 lane's 4 bytes/triple
# (e2e_cg ships 1-byte codes), summed over the mode's timed runs
_EST_UPLOAD = {"e2e": 5 * 4, "e2e_em": 6 * 4, "e2e_cg": 3 * 1,
               "boot": 1 * 4, "e2e1m": 2 * 4}  # bytes/triple x runs
_LINK_MBPS: float | None = None  # measured once by main_all
_SHAPES = {  # (N_env_default, S for the mode) — mirrors each main_*
    "e2e": 1 << 16, "e2e_em": 1 << 14, "e2e_cg": 1 << 16,
    "boot": 1 << 18, "e2e1m": 1 << 20,
}
_S_ENV = {"e2e": "NGSDIST_BENCH_N_SITES", "e2e_cg": "NGSDIST_BENCH_N_SITES",
          "e2e_em": "NGSDIST_BENCH_EM_E2E_SITES",
          "boot": "NGSDIST_BENCH_BOOT_SITES", "e2e1m": "NGSDIST_BENCH_1M_SITES"}


def _mode_estimate(name: str) -> float:
    est = float(_EST_FIXED.get(name, 120))
    if name in _SHAPES:
        N = int(os.environ.get("NGSDIST_BENCH_N_IND", 1024))
        S = int(os.environ.get(_S_ENV[name], _SHAPES[name]))
        if name in _EST_UPLOAD and _LINK_MBPS:
            est += S * N * _EST_UPLOAD[name] / (_LINK_MBPS * 1e6)
        # generation cost on a cache miss (~65 MB/s)
        path = os.path.join(_cache_dir(), f"gp_{N}x{S}_s7.bin")
        if not (os.path.exists(path) and
                os.path.getsize(path) == S * N * 24):
            est += S * N * 24 / 65e6
    return est


def _emit(results: dict, final: bool = False) -> int:
    """Print the combined JSON line for the modes captured SO FAR.
    Called after every mode (and once at the end): the driver keeps the
    last stdout JSON line, so a run killed at its timeout still leaves
    a parseable record of everything that finished (BENCH_r04 lesson —
    the round-4 record was rc 124 / parsed null)."""
    head = next((results[n] for n, _ in _MODES
                 if "value" in results.get(n, {})), None)
    if head is None:
        print(json.dumps({"metrics": results}), flush=True)
        return 1
    out = dict(head)
    out["metrics"] = {n: r for n, r in results.items()
                      if r.get("metric") != head.get("metric")}
    if not final:
        out["partial"] = True
    print(json.dumps(out), flush=True)
    return 0


def main_all() -> int:
    """Default invocation: every headline metric, one combined JSON line.

    The top-level metric/value/vs_baseline stay the indep headline (the
    contract's north star, BASELINE.json) so consumers of the old
    single-metric format keep working; the other modes land under
    "metrics".  A failing mode is recorded and skipped, not fatal —
    BENCH artifacts should carry whatever the chip gave us."""
    budget = float(os.environ.get("NGSDIST_BENCH_BUDGET", "1100"))
    t_start = time.perf_counter()
    global _DEADLINE, _LINK_MBPS
    _DEADLINE = t_start + budget
    try:
        _LINK_MBPS = _tunnel_probe(32 << 20)
        print(f"# bench: link probe {_LINK_MBPS:.0f} MB/s (mode cost "
              "estimates scale with it)", file=sys.stderr)
    except Exception as ex:
        print(f"# bench: link probe failed ({ex}); fixed estimates",
              file=sys.stderr)
    results: dict = {}
    for name, fn in _MODES:
        spent = time.perf_counter() - t_start
        est = _mode_estimate(name)
        if spent + est > budget:
            results[name] = {"skipped": f"estimated {est:.0f}s exceeds "
                             f"remaining budget ({budget - spent:.0f}s "
                             f"of {budget:.0f}s)"}
            print(f"# bench: skipping {name} — est {est:.0f}s vs "
                  f"{budget - spent:.0f}s left", file=sys.stderr)
            continue
        try:
            results[name] = fn()
        except Exception as ex:  # isolate: one dead mode != no artifact
            results[name] = {"error": f"{type(ex).__name__}: {ex}"}
            print(f"# bench: {name} mode failed: {ex}", file=sys.stderr)
        _emit(results)
    return _emit(results, final=True)


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
    """Fail ONLY after retrying a dead backend for the full probe window.

    Backend bring-up through the axon tunnel blocks inside native code
    when the tunnel is down, so an in-process alarm cannot interrupt it
    — probe jax.devices() in a subprocess under a wall-clock bound.
    The tunnel is known to flake and recover on minute timescales
    (BENCH_r02 lost the round's perf artifact to a single-window
    probe), so retry with backoff until NGSDIST_BENCH_PROBE_TIMEOUT
    (seconds, default 600, 0 = skip) expires, and report the failing
    stage (timeout vs init error) of the LAST attempt when giving up.
    """
    import subprocess

    total = float(os.environ.get("NGSDIST_BENCH_PROBE_TIMEOUT", "600"))
    if total <= 0:
        return
    code = (
        "import os, jax\n"
        "plat = os.environ.get('NGSDIST_BENCH_PLATFORM')\n"
        "if plat: jax.config.update('jax_platforms', plat)\n"
        "print(jax.devices()[0].platform)\n"
    )
    deadline = time.monotonic() + total
    attempt = 0
    last = "no attempt ran"
    while True:
        attempt += 1
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            break
        # Per-attempt window: long enough for a cold backend bring-up
        # (~10-40 s when healthy), short enough to retry a hung tunnel
        # several times inside the total budget.
        per = min(max(60.0, remaining / 4), remaining)
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=per,
            )
        except subprocess.TimeoutExpired:
            last = (f"attempt {attempt}: jax.devices() hung for "
                    f"{per:.0f}s (tunnel down?)")
            print(f"# bench probe: {last}; retrying "
                  f"({deadline - time.monotonic():.0f}s left)",
                  file=sys.stderr)
            continue
        if proc.returncode == 0:
            if attempt > 1:
                print(f"# bench probe: backend came up on attempt {attempt}",
                      file=sys.stderr)
            return
        last = (f"attempt {attempt}: backend init failed rc="
                f"{proc.returncode}: {proc.stderr.strip()[-500:]}")
        print(f"# bench probe: {last}; retrying in 10s", file=sys.stderr)
        time.sleep(min(10.0, max(0.0, deadline - time.monotonic())))
    print(
        f"# bench: device backend unreachable for {total:.0f}s "
        f"({attempt} attempts). Last failure: {last}",
        file=sys.stderr,
    )
    sys.exit(2)


if __name__ == "__main__":
    _probe_backend()
    _apply_platform()
    if "--em" in sys.argv:
        print(json.dumps(main_em()))
    elif "--e2e" in sys.argv:
        print(json.dumps(main_e2e()))
    elif "--e2e1m" in sys.argv:
        print(json.dumps(main_e2e_1m()))
    elif "--e2e_em" in sys.argv:
        print(json.dumps(main_e2e_em()))
    elif "--e2e_cg" in sys.argv:
        print(json.dumps(main_e2e_cg()))
    elif "--boot" in sys.argv:
        print(json.dumps(main_boot()))
    elif "--indep" in sys.argv:
        print(json.dumps(main_indep()))
    else:
        sys.exit(main_all())
