"""Fused indep-path Pallas kernel vs the XLA einsum engine (interpret)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ngsdist_tpu.config import default_score_matrix
from ngsdist_tpu.core import distance as dist
from ngsdist_tpu.ops.pallas_indep import indep_raw_cnt_pallas


def _rand_probs(rng, S, N, missing_frac=0.2):
    P = rng.dirichlet(np.ones(3), size=(S, N)).astype(np.float64)
    miss = rng.random((S, N)) < missing_frac
    P[miss] = 1.0 / 3.0
    return P


@pytest.mark.parametrize("pairwise_del", [False, True])
@pytest.mark.parametrize("avg_nuc", [False, True])
def test_pallas_indep_matches_einsum(pairwise_del, avg_nuc):
    rng = np.random.default_rng(0)
    S, N = 53, 11  # ragged both axes
    P = _rand_probs(rng, S, N)
    score = default_score_matrix(avg_nuc)

    raw_ref, cnt_ref = dist.indep_suffstats(
        jnp.asarray(P), jnp.asarray(score), pairwise_del
    )
    iu = np.triu_indices(N, k=1)
    raw, cnt = indep_raw_cnt_pallas(
        jnp.asarray(P), score, pairwise_del,
        block=8, site_tile=8, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(raw)[iu], np.asarray(raw_ref)[iu], rtol=1e-12, atol=1e-12
    )
    if pairwise_del:
        np.testing.assert_allclose(
            np.asarray(cnt)[iu], np.asarray(cnt_ref)[iu], rtol=0, atol=0
        )
    else:
        np.testing.assert_array_equal(np.asarray(cnt)[iu], float(S))


@pytest.mark.parametrize("pairwise_del", [False, True])
def test_pallas_indep_weighted_matches_einsum(pairwise_del):
    """Per-site weights (bootstrap multiplicities) through the kernel
    must equal the weighted einsum engine — the no-gather replicate
    contract (ngsDist.cpp:416-437 aliasing semantics)."""
    rng = np.random.default_rng(3)
    S, N = 53, 11
    P = _rand_probs(rng, S, N)
    score = default_score_matrix()
    w = rng.integers(0, 4, size=S).astype(np.float64)

    raw_ref, cnt_ref = dist.indep_suffstats(
        jnp.asarray(P), jnp.asarray(score), pairwise_del, jnp.asarray(w)
    )
    iu = np.triu_indices(N, k=1)
    raw, cnt = indep_raw_cnt_pallas(
        jnp.asarray(P), score, pairwise_del, site_weights=w,
        block=8, site_tile=8, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(raw)[iu], np.asarray(raw_ref)[iu], rtol=1e-12, atol=1e-12
    )
    if pairwise_del:
        np.testing.assert_allclose(
            np.asarray(cnt)[iu], np.asarray(cnt_ref)[iu], rtol=0, atol=1e-12
        )


def test_streamed_bootstrap_weighted_kernel_interpret(monkeypatch):
    """Chunk-streamed bootstrap replicates (weighted kernel, one
    compiled shape) must match the unstreamed einsum engine."""
    from ngsdist_tpu.config import Params
    from ngsdist_tpu.core import bootstrap as bt

    rng = np.random.default_rng(11)
    S, N = 60, 9
    P = _rand_probs(rng, S, N)
    pars = Params(in_geno="x", n_ind=N, n_sites=S, out="y", seed=9,
                  indep_geno=True, pairwise_del=True, in_probs=True,
                  n_boot_rep=3, boot_block_size=7)
    n_trunc, maps = bt.site_maps(pars.seed, pars.n_boot_rep, S,
                                 pars.boot_block_size)

    monkeypatch.setenv("NGSDIST_PALLAS", "0")
    monkeypatch.delenv("NGSDIST_DEVICE_BUDGET", raising=False)
    ref = list(dist.iter_replicates(pars, P, maps, n_trunc))
    monkeypatch.setenv("NGSDIST_PALLAS", "interpret")
    # Budget forces ~3 site chunks -> streamed weighted-kernel replicates.
    monkeypatch.setenv("NGSDIST_DEVICE_BUDGET", str(20 * N * 3 * 8))
    got = list(dist.iter_replicates(pars, P, maps, n_trunc))
    assert len(got) == len(ref) == 4
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r, rtol=0, atol=1e-9)


@pytest.mark.parametrize("weighted", [False, True])
def test_pallas_indep_super_variant_matches_einsum(weighted):
    """N past the resident-output VMEM bound routes to the superblock
    panel kernel (plan_layout mode "super"); both variants must agree
    with the einsum engine."""
    from ngsdist_tpu.ops.pallas_indep import plan_layout

    rng = np.random.default_rng(17)
    S, N, block = 37, 70, 8  # 9 row blocks > RESIDENT_MAX_NB
    assert plan_layout(S, N, block=block, site_tile=8)[0] == "super"
    P = _rand_probs(rng, S, N)
    score = default_score_matrix()
    w = rng.integers(0, 4, size=S).astype(np.float64) if weighted else None

    raw_ref, _ = dist.indep_suffstats(
        jnp.asarray(P), jnp.asarray(score), True,
        None if w is None else jnp.asarray(w),
    )
    iu = np.triu_indices(N, k=1)
    raw, _ = indep_raw_cnt_pallas(
        jnp.asarray(P), score, True, site_weights=w,
        block=block, site_tile=8, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(raw)[iu], np.asarray(raw_ref)[iu], rtol=1e-12, atol=1e-12
    )


def test_pallas_indep_super_three_panels():
    """ns=3 panel grid (6 panel pairs, 3 diagonal) with a padding block
    in the last panel: every panel-pair class and the diagonal
    sub-block skip must agree with the einsum engine."""
    from ngsdist_tpu.ops.pallas_indep import _super_shape, plan_layout

    rng = np.random.default_rng(31)
    S, N, block = 29, 89, 8            # nb=12 -> ns=3, G=4, N_pad=96
    assert plan_layout(S, N, block=block, site_tile=8)[0] == "super"
    assert _super_shape(N, block) == (3, 4, 96)
    P = _rand_probs(rng, S, N)
    score = default_score_matrix()
    w = rng.integers(0, 3, size=S).astype(np.float64)

    raw_ref, cnt_ref = dist.indep_suffstats(
        jnp.asarray(P), jnp.asarray(score), True, jnp.asarray(w)
    )
    iu = np.triu_indices(N, k=1)
    raw, cnt = indep_raw_cnt_pallas(
        jnp.asarray(P), score, True, site_weights=w,
        block=block, site_tile=8, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(raw)[iu], np.asarray(raw_ref)[iu], rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(cnt)[iu], np.asarray(cnt_ref)[iu], rtol=1e-12, atol=1e-12
    )


def test_plane_major_prepared_input_matches():
    """prepare_plane_major + plane_major= must equal the site-major
    dispatch (the once-per-chunk relayout replicate streams reuse)."""
    from ngsdist_tpu.ops.pallas_indep import prepare_plane_major

    rng = np.random.default_rng(23)
    S, N = 53, 11
    P = _rand_probs(rng, S, N)
    score = default_score_matrix()
    w = rng.integers(0, 4, size=S).astype(np.float64)

    P3, dims = prepare_plane_major(jnp.asarray(P), block=8, site_tile=8)
    assert dims == (S, N)
    for sw in (None, w):
        raw_ref, cnt_ref = indep_raw_cnt_pallas(
            jnp.asarray(P), score, True, site_weights=sw,
            block=8, site_tile=8, interpret=True,
        )
        raw, cnt = indep_raw_cnt_pallas(
            P3, score, True, site_weights=sw,
            block=8, site_tile=8, interpret=True, plane_major=dims,
        )
        np.testing.assert_array_equal(np.asarray(raw), np.asarray(raw_ref))
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt_ref))


def test_plane_major_mismatch_raises():
    rng = np.random.default_rng(29)
    P = _rand_probs(rng, 16, 5)
    score = default_score_matrix()
    with pytest.raises(ValueError, match="plane_major input"):
        indep_raw_cnt_pallas(jnp.asarray(P), score, True,
                             block=8, site_tile=8, interpret=True,
                             plane_major=(16, 5))
    from ngsdist_tpu.ops.pallas_indep import prepare_plane_major

    P3, _ = prepare_plane_major(jnp.asarray(P), block=8, site_tile=8)
    with pytest.raises(ValueError, match="does not match the planned"):
        # layout prepared for block=8 (N_pad=8) dispatched at block=16
        indep_raw_cnt_pallas(P3, score, True, block=16, site_tile=8,
                             interpret=True, plane_major=(16, 5))


@pytest.mark.parametrize("indep", [True, False])
def test_pipeline_pallas_dispatch_interpret(monkeypatch, indep):
    """Full replicate pipeline with NGSDIST_PALLAS=interpret must match
    the scan/einsum engines (same pair order, same finalization)."""
    from ngsdist_tpu.config import Params
    from ngsdist_tpu.core import bootstrap as bt

    rng = np.random.default_rng(5)
    S, N = 41, 7
    P = _rand_probs(rng, S, N)
    pars = Params(in_geno="x", n_ind=N, n_sites=S, out="y", seed=3,
                  indep_geno=indep, pairwise_del=True, in_probs=True)
    n_trunc, maps = bt.site_maps(pars.seed, 0, S, 1)

    monkeypatch.setenv("NGSDIST_PALLAS", "0")
    ref = list(dist.iter_replicates(pars, P, maps, n_trunc))[0]
    monkeypatch.setenv("NGSDIST_PALLAS", "interpret")
    got = list(dist.iter_replicates(pars, P, maps, n_trunc))[0]
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-9)


def test_pallas_indep_panel_sublists_cover_triangle():
    """Runtime panel sublists (the 2-D pairs-mesh TP split): summing the
    triu of each sublist's output — including a padding entry at the
    strictly-lower panel (1, 0) — must reproduce the full kernel run
    bit-exactly (same super variant, same per-panel arithmetic)."""
    from ngsdist_tpu.ops.pallas_indep import _super_shape

    rng = np.random.default_rng(41)
    S, N, block = 23, 89, 8            # nb=12 -> ns=3, G=4, N_pad=96
    assert _super_shape(N, block) == (3, 4, 96)
    P = _rand_probs(rng, S, N)
    score = default_score_matrix()
    w = rng.integers(0, 3, size=S).astype(np.float64)

    full_raw, full_cnt = indep_raw_cnt_pallas(
        jnp.asarray(P), score, True, site_weights=w,
        block=block, site_tile=8, interpret=True,
    )
    full_raw, full_cnt = np.triu(full_raw), np.triu(full_cnt)

    # 6 panel pairs split 3/3; the second sublist pads with (1, 0)
    subs = [([0, 1, 2], [0, 1, 2]),           # diagonals
            ([0, 0, 1, 1], [1, 2, 2, 0])]     # off-diagonals + padding
    acc_r = np.zeros_like(full_raw)
    acc_c = np.zeros_like(full_cnt)
    for IS, JS in subs:
        r, c = indep_raw_cnt_pallas(
            jnp.asarray(P), score, True, site_weights=w,
            block=block, site_tile=8, interpret=True,
            panels=(np.asarray(IS, np.int32), np.asarray(JS, np.int32)),
        )
        acc_r += np.triu(r)
        acc_c += np.triu(c)
    np.testing.assert_array_equal(acc_r, full_raw)
    np.testing.assert_array_equal(acc_c, full_cnt)


def test_pallas_indep_panels_requires_two_superblocks():
    rng = np.random.default_rng(42)
    P = _rand_probs(rng, 8, 20)
    with pytest.raises(ValueError, match="ns >= 2"):
        indep_raw_cnt_pallas(
            jnp.asarray(P), default_score_matrix(), True,
            block=8, site_tile=8, interpret=True,
            panels=(np.zeros(1, np.int32), np.zeros(1, np.int32)),
        )
