"""Bit-exact CPU pairwise-distance path (parity oracle).

Thin wrapper over the native engine (ngsdist_native.c: nd_pair_dists),
which accumulates per pair in the reference's exact operation order
(/root/reference/ngsDist.cpp:325-404) with glibc transcendentals, so the
formatted output is md5-identical to a reference run.  The TPU engine in
core/distance.py is the performance path; tests pin it against this one.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..utils import native as _native


def to_ind_major(P_site_major: np.ndarray) -> np.ndarray:
    """[n_sites, n_ind, 3] -> contiguous [n_ind, n_sites, 3] for the
    pair-loop engine's cache behavior."""
    return np.ascontiguousarray(P_site_major.transpose(1, 0, 2))


def pair_dists_exact(
    P_ind_major: np.ndarray,
    score: np.ndarray,
    indep: bool,
    pairwise_del: bool,
    tot_sites: int,
    evol_model: int,
    n_threads: int = 1,
    site_map: Optional[np.ndarray] = None,
    n_used: Optional[int] = None,
) -> np.ndarray:
    """Full symmetric [n_ind, n_ind] distance matrix (diagonal 0).

    site_map (int64, destination order) selects/repeats source sites for
    bootstrap replicates; n_used limits the site count (truncation).
    """
    n_ind, n_sites, _ = P_ind_major.shape
    if n_used is None:
        n_used = n_sites if site_map is None else len(site_map)
    lib = _native.get_lib()
    out = np.zeros((n_ind, n_ind), dtype=np.float64)
    score64 = np.ascontiguousarray(score, dtype=np.float64)
    map_ptr = None
    if site_map is not None:
        site_map = np.ascontiguousarray(site_map, dtype=np.int64)
        map_ptr = _native.as_i64_ptr(site_map)
    rc = lib.nd_pair_dists(
        _native.as_double_ptr(P_ind_major), n_ind, n_sites,
        map_ptr, n_used,
        _native.as_double_ptr(score64.reshape(-1)),
        int(indep), int(pairwise_del), tot_sites, evol_model, n_threads,
        _native.as_double_ptr(out),
    )
    if rc == 2:
        # Reference aborts inside the first pair task (ngsDist.cpp:387-398).
        from .models import check_model_supported

        check_model_supported(evol_model)
    return out
