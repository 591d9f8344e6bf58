"""Pallas EM kernel vs the batched JAX EM (interpret mode on CPU).

The kernel reformulates the per-(pair,site) EM as elementwise powers of
the max-normalised joint weights (see ops/pallas_em.py docstring); the
update order, convergence rule (|Δloglik| < 0.001 as a ratio test) and
50-iteration cap match core/em.py, so float64 interpret-mode results
agree to reduction-order rounding.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ngsdist_tpu.config import default_score_matrix
from ngsdist_tpu.core import distance as dist
from ngsdist_tpu.ops.pallas_em import em_raw_cnt_pallas


def _rand_probs(rng, S, N, missing_frac=0.15):
    P = rng.dirichlet(np.ones(3), size=(S, N)).astype(np.float64)
    miss = rng.random((S, N)) < missing_frac
    P[miss] = 1.0 / 3.0
    return P


def _triu(vals_pairs, N):
    iu = np.triu_indices(N, k=1)
    out = np.zeros((N, N))
    out[iu] = vals_pairs
    return out, iu


@pytest.mark.parametrize("pairwise_del", [False, True])
def test_pallas_em_matches_batched(pairwise_del):
    rng = np.random.default_rng(0)
    S, N = 37, 10  # ragged: exercises site and individual padding
    P = _rand_probs(rng, S, N)
    score9 = default_score_matrix().reshape(-1)

    raw_ref, cnt_ref, _, _ = dist.em_suffstats(
        jnp.asarray(P), jnp.asarray(score9), pairwise_del
    )
    raw_m, iu = _triu(np.asarray(raw_ref), N)
    cnt_m, _ = _triu(np.asarray(cnt_ref), N)

    raw, cnt = em_raw_cnt_pallas(
        jnp.asarray(P), score9, pairwise_del,
        block=8, site_tile=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(raw)[iu], raw_m[iu], rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(cnt)[iu], cnt_m[iu], rtol=0, atol=1e-9)


def test_pallas_em_site_weights():
    rng = np.random.default_rng(1)
    S, N = 24, 6
    P = _rand_probs(rng, S, N)
    score9 = default_score_matrix().reshape(-1)
    w = rng.integers(0, 3, size=S).astype(np.float64)

    raw_ref, cnt_ref, _, _ = dist.em_suffstats(
        jnp.asarray(P), jnp.asarray(score9), True, site_weights=w
    )
    iu = np.triu_indices(N, k=1)
    raw, cnt = em_raw_cnt_pallas(
        jnp.asarray(P), score9, True, site_weights=w,
        block=8, site_tile=8, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(raw)[iu], np.asarray(raw_ref), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(cnt)[iu], np.asarray(cnt_ref), rtol=0, atol=1e-9
    )


def test_pallas_em_float_weights():
    """Non-integer weights (substitution-class masks scaled by bootstrap
    multiplicities) stream through the kernel's weight block — no
    integer-multiplicity restriction, no site gather."""
    rng = np.random.default_rng(3)
    S, N = 24, 6
    P = _rand_probs(rng, S, N)
    score9 = default_score_matrix().reshape(-1)
    w = rng.random(S)  # arbitrary floats incl. values in (0, 1)
    w[::5] = 0.0

    raw_ref, cnt_ref, _, _ = dist.em_suffstats(
        jnp.asarray(P), jnp.asarray(score9), True, site_weights=w
    )
    iu = np.triu_indices(N, k=1)
    raw, cnt = em_raw_cnt_pallas(
        jnp.asarray(P), score9, True, site_weights=w,
        block=8, site_tile=8, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(raw)[iu], np.asarray(raw_ref), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(cnt)[iu], np.asarray(cnt_ref), rtol=1e-12, atol=1e-9
    )


def test_pallas_em_weighted_single_compile():
    """Bootstrap replicates differ only in weight VALUES; every replicate
    must reuse the one compiled kernel shape (the round-1 gather path
    recompiled per distinct resampled length)."""
    from ngsdist_tpu.ops import pallas_em as pe

    rng = np.random.default_rng(4)
    S, N = 20, 5
    P = jnp.asarray(_rand_probs(rng, S, N))
    score9 = default_score_matrix().reshape(-1)

    before = pe._em_pallas_padded._cache_size()
    outs = []
    for rep in range(3):
        w = rng.integers(0, 4, size=S).astype(np.float64)
        raw, _ = em_raw_cnt_pallas(
            P, score9, False, site_weights=w, block=8, site_tile=8,
            interpret=True,
        )
        outs.append(np.asarray(raw))
    added = pe._em_pallas_padded._cache_size() - before
    assert added <= 1, f"weighted kernel recompiled per replicate ({added} entries)"
    assert not np.allclose(outs[0], outs[1])  # weights actually applied


def test_pallas_em_hard_genotype_lanes():
    """One-hot (called) genotypes: EM converges immediately; kernel must
    agree on the degenerate lanes too."""
    rng = np.random.default_rng(2)
    S, N = 16, 4
    g = rng.integers(0, 3, size=(S, N))
    P = np.zeros((S, N, 3))
    P[np.arange(S)[:, None], np.arange(N)[None, :], g] = 1.0
    P[0, :] = 1.0 / 3.0  # one fully-missing site
    score9 = default_score_matrix().reshape(-1)

    raw_ref, cnt_ref, _, _ = dist.em_suffstats(
        jnp.asarray(P), jnp.asarray(score9), False
    )
    iu = np.triu_indices(N, k=1)
    raw, cnt = em_raw_cnt_pallas(
        jnp.asarray(P), score9, False, block=8, site_tile=8, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(raw)[iu], np.asarray(raw_ref), rtol=1e-9, atol=1e-9
    )


def test_pallas_em_slowest_converging_lanes():
    """Channels (1, 0.94, 0.93) are the slowest-converging shape for the
    rank-1 ratio test: k* = 39, deep in the 6th exit-check chunk of the
    kernel's chunked while_loop (empirical max over 2-parameter sides —
    the power-sum ratio decays geometrically, so the reference's
    50-iteration cap is unreachable at tole=1e-3 and exists only as a
    defensive bound).  Fast lanes mixed in exercise per-lane k* spread
    within one slab."""
    S, N = 8, 4
    p = np.array([1.0, 0.94, 0.93])
    P = np.tile((p / p.sum()), (S, N, 1))
    # a couple of fast lanes mixed in so the slab isn't uniformly slow
    P[:, 0] = np.array([1.0, 1e-9, 1e-9]) / (1.0 + 2e-9)
    score9 = default_score_matrix().reshape(-1)

    raw_ref, cnt_ref, _, _ = dist.em_suffstats(
        jnp.asarray(P), jnp.asarray(score9), False
    )
    iu = np.triu_indices(N, k=1)
    raw, cnt = em_raw_cnt_pallas(
        jnp.asarray(P), score9, False, block=8, site_tile=8, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(raw)[iu], np.asarray(raw_ref), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(cnt)[iu], np.asarray(cnt_ref), rtol=0, atol=1e-9
    )


def test_pallas_em_block_sublists():
    """The pairs-axis TP path gives each device a SUBLIST of upper-tri
    blocks (runtime scalar-prefetch lists): the union of two disjoint
    sublists — each padded with the never-read lower-triangle block
    (1, 0) — must reproduce the full enumeration on the pairs each
    sublist covers."""
    from ngsdist_tpu.ops.pallas_em import _upper_blocks

    rng = np.random.default_rng(3)
    S, N, B = 16, 20, 8  # N_pad 24 -> nb=3 -> 6 upper blocks
    P = _rand_probs(rng, S, N)
    score9 = default_score_matrix().reshape(-1)

    full_raw, full_cnt = em_raw_cnt_pallas(
        jnp.asarray(P), score9, True, block=B, site_tile=8, interpret=True
    )
    IB, JB = _upper_blocks(3)
    assert len(IB) == 6
    halves = [(IB[:3], JB[:3]), (IB[3:], JB[3:])]
    # pad the second half to the longer length with the (1, 0) block
    import numpy as _np

    h2 = (_np.append(halves[1][0], 1).astype(_np.int32),
          _np.append(halves[1][1], 0).astype(_np.int32))
    halves[1] = h2

    for (ib, jb) in halves:
        raw, cnt = em_raw_cnt_pallas(
            jnp.asarray(P), score9, True, block=B, site_tile=8,
            interpret=True, blocks=(jnp.asarray(ib), jnp.asarray(jb)),
        )
        # every pair whose block is in this sublist must match the full run
        for g in range(len(ib)):
            bi, bj = int(ib[g]), int(jb[g])
            if bi > bj:
                continue  # the padding block
            for i in range(bi * B, min((bi + 1) * B, N)):
                for j in range(max(i + 1, bj * B), min((bj + 1) * B, N)):
                    np.testing.assert_allclose(
                        float(raw[i, j]), float(full_raw[i, j]),
                        rtol=1e-12, atol=1e-12)
                    np.testing.assert_allclose(
                        float(cnt[i, j]), float(full_cnt[i, j]),
                        rtol=0, atol=1e-12)
