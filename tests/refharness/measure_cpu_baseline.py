#!/usr/bin/env python
"""Measure reference ngsDist CPU throughput -> BENCH_baseline.json.

Builds the reference binary (build_ref.sh), generates a synthetic binary
normal-space GP input, runs it with all local cores on the
independent-genotypes path, and records pair-site updates/sec.  The
64-thread baseline the driver compares against (BASELINE.json north
star) is extrapolated as perfect linear scaling from the measured
per-thread rate — generous to the reference, since its pair-task pool
(ngsDist.cpp:244-262) also contends on memory bandwidth.

Usage: python tests/refharness/measure_cpu_baseline.py [n_ind] [n_sites]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
REF_BIN = os.path.join(HERE, "build", "ngsDist_ref")
OUT_JSON = os.path.join(REPO, "BENCH_baseline.json")


def build_ref() -> None:
    subprocess.run(["bash", os.path.join(HERE, "build_ref.sh")], check=True)


def main() -> None:
    n_ind = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_sites = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    n_threads = os.cpu_count() or 1

    build_ref()

    rng = np.random.default_rng(42)
    gp = rng.dirichlet(np.ones(3), size=(n_sites, n_ind)).astype(np.float64)

    with tempfile.TemporaryDirectory() as td:
        geno = os.path.join(td, "gp.bin")  # site-major doubles (read_data.cpp:29-47)
        gp.tofile(geno)
        out = os.path.join(td, "out.dist")
        cmd = [
            REF_BIN, "--geno", geno, "--n_ind", str(n_ind),
            "--n_sites", str(n_sites), "--probs", "--indep_geno",
            "--out", out, "--n_threads", str(n_threads), "--verbose", "0",
        ]
        t0 = time.perf_counter()
        subprocess.run(cmd, check=True, capture_output=True)
        elapsed = time.perf_counter() - t0

    n_pairs = n_ind * (n_ind - 1) // 2
    updates = float(n_pairs) * float(n_sites)
    rate = updates / elapsed
    per_thread = rate / n_threads

    # EM path (no --indep_geno): the reference runs the per-(pair,site)
    # 9-cell EM (emOptim2.cpp em2, <=50 iters) — measured at a smaller
    # shape because it is ~2 orders slower per update.
    em_ind, em_sites = min(n_ind, 24), min(n_sites, 20_000)
    with tempfile.TemporaryDirectory() as td:
        geno = os.path.join(td, "gp.bin")
        gp[:em_sites, :em_ind].tofile(geno)
        out = os.path.join(td, "out.dist")
        cmd = [
            REF_BIN, "--geno", geno, "--n_ind", str(em_ind),
            "--n_sites", str(em_sites), "--probs",
            "--out", out, "--n_threads", str(n_threads), "--verbose", "0",
        ]
        t0 = time.perf_counter()
        subprocess.run(cmd, check=True, capture_output=True)
        em_elapsed = time.perf_counter() - t0
    em_pairs = em_ind * (em_ind - 1) // 2
    em_rate = float(em_pairs) * float(em_sites) / em_elapsed
    em_per_thread = em_rate / n_threads

    result = {
        "reference": "fgvieira/ngsDist @ /root/reference (indep path, binary GP)",
        "n_ind": n_ind,
        "n_sites": n_sites,
        "n_threads_measured": n_threads,
        "elapsed_sec": elapsed,
        "cpu_updates_per_sec_measured": rate,
        "cpu_updates_per_sec_per_thread": per_thread,
        "cpu64_updates_per_sec": per_thread * 64,
        "em_n_ind": em_ind,
        "em_n_sites": em_sites,
        "em_elapsed_sec": em_elapsed,
        "cpu_em_updates_per_sec_measured": em_rate,
        "cpu_em_updates_per_sec_per_thread": em_per_thread,
        "cpu64_em_updates_per_sec": em_per_thread * 64,
        "note": "cpu64 extrapolated as 64x per-thread rate (ideal scaling)",
    }
    with open(OUT_JSON, "w") as fh:
        json.dump(result, fh, indent=2)
        fh.write("\n")
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
