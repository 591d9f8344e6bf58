#!/usr/bin/env python
"""Scaling-efficiency harness: sharded engine over 1..n-device meshes.

The SURVEY.md build plan calls for a 1-chip / 1-host / N-host scaling
report (§7 step 5).  This harness runs the mesh-sharded independent-path
sufficient statistics over growing device meshes and reports pair-site
updates/sec and parallel efficiency per mesh size, one JSON line each.

On a multi-chip TPU slice the collectives ride ICI and the numbers are
real scaling; on a single host this can also demonstrate the sharding
with virtual devices (NGSDIST_SCALING_FORCE_CPU=1 forces an 8-way
virtual CPU mesh — functional, not a performance statement).

Usage: python bench_scaling.py  [env: NGSDIST_BENCH_N_IND,
NGSDIST_BENCH_N_SITES shape knobs]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    if os.environ.get("NGSDIST_SCALING_FORCE_CPU") == "1":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    if os.environ.get("NGSDIST_SCALING_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    import jax.numpy as jnp

    from jax.sharding import NamedSharding, PartitionSpec as PS

    from ngsdist_tpu.config import default_score_matrix
    from ngsdist_tpu.parallel import make_mesh, sharded_suffstats
    from ngsdist_tpu.parallel.mesh import AXIS

    N = int(os.environ.get("NGSDIST_BENCH_N_IND", 256))
    S = int(os.environ.get("NGSDIST_BENCH_N_SITES", 1 << 17))

    rng = np.random.default_rng(0)
    P = rng.dirichlet(np.ones(3), size=(S, N)).astype(np.float32)
    score = default_score_matrix()
    updates = (N * (N - 1) / 2) * S

    def measure(mesh):
        """Time the engine with the tensor pre-placed on the mesh: the
        metric is compute + collectives, not the host->device copy
        (which a remote-tunnel rig measures at ~8 MB/s and a local
        PCIe link at GB/s — neither is the engine)."""
        sharding = NamedSharding(mesh, PS(AXIS, None, None))
        Pd = jax.device_put(jnp.asarray(P), sharding)
        args = dict(indep=True, pairwise_del=True, dtype=jnp.float32,
                    n_sites=S)
        raw, *_ = sharded_suffstats(Pd, score, mesh, **args)
        _ = np.asarray(raw)  # warm / compile
        times = []
        for _i in range(3):
            t0 = time.perf_counter()
            for _r in range(4):
                raw, *_ = sharded_suffstats(Pd, score, mesh, **args)
            _ = np.asarray(raw)  # tunnel-safe completion barrier
            times.append((time.perf_counter() - t0) / 4)
        return updates / min(times)

    n_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    base_rate = None
    for nd in sizes:
        if S % nd:
            continue
        rate = measure(make_mesh(n_devices=nd))
        if base_rate is None:
            base_rate = rate
        print(json.dumps({
            "metric": "pair_site_updates_per_sec",
            "devices": nd,
            "value": rate,
            "unit": "updates/s",
            "efficiency_vs_1dev": rate / (base_rate * nd),
        }))

    # 2-D (sites, pairs) meshes: the optional TP axis for large cohorts
    # (SURVEY.md §2.3 TP row) — report the same metric per factorization.
    for nd in sizes:
        if nd < 2:
            continue
        for p in (2, 4):
            if nd % p or p > nd or S % (nd // p):
                continue
            rate = measure(make_mesh(n_devices=nd, pairs=p))
            print(json.dumps({
                "metric": "pair_site_updates_per_sec",
                "devices": nd,
                "mesh": {"sites": nd // p, "pairs": p},
                "value": rate,
                "unit": "updates/s",
                "efficiency_vs_1dev": rate / (base_rate * nd),
            }))


if __name__ == "__main__":
    main()
