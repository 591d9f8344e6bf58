"""Pallas TPU kernel for the independent-genotypes distance path.

The XLA formulation (core/distance.py indep_suffstats) computes the full
[N, N] contraction; this kernel computes only the upper-triangular
individual blocks (halving MXU work — the matrix is symmetric), and
fuses the missing-data mask, the probability masking and the score fold
into the matmul's operand production, so the genotype tensor is read
from HBM exactly once per block row/column.

Data layout: the host passes the probabilities as three planes
[3, S, N] (genotype-major).  A [TS, B, 3]-blocked layout would be
lane-padded 3 -> 128 in VMEM (43x memory blowup — the scoped-VMEM OOM
this replaced); plane-major blocks (3, TS, B) are tightly tiled.

Per grid step (upper block pair (IB, JB), site tile):
    vi[s,a]   = site a valid at s              (miss_data, gen_func.cpp:862-868)
    Qi_g      = Pi_g * vi                      three [TS, B] planes
    Yj_g      = Σ_h score[g,h]·Qj_h            (score fold on the j side)
    raw[a,b] += Σ_{g,s} Qi_g[s,a]·Yj_g[s,b]    — MXU dot, K = 3·TS
    cnt[a,b] += Σ_s vi[s,a]·vj[s,b]            — MXU dot, K = TS
accumulated across site tiles into the resident [B, B] output block.

Without pairwise deletion the mask is applied only to padding (all-zero
probability rows are already inert) and cnt counts real sites, matching
the reference's unconditional site counter (ngsDist.cpp:362).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPSILON = 1e-5  # miss_data tolerance (gen_func.hpp:16)

DEFAULT_BLOCK = 128
# 512-site tiles amortize per-grid-step overhead: 1.91e12 vs 1.39e12
# pair-site updates/s at 128 on v5e (B=128, N=1024 sweep).
DEFAULT_SITE_TILE = 512

import os as _os

_PRECISION = (
    jax.lax.Precision.DEFAULT
    if _os.environ.get("NGSDIST_MXU_PRECISION") == "fast"
    else jax.lax.Precision.HIGHEST
)


def _valid(P0, P1, P2, dtype):
    nonmiss = (jnp.abs(P0 - P1) >= EPSILON) | (jnp.abs(P1 - P2) >= EPSILON)
    # padded rows are all-zero: treat as missing so cnt excludes them
    nonzero = (P0 + P1 + P2) > 0.0
    return (nonmiss & nonzero).astype(dtype), nonzero.astype(dtype)


def _indep_kernel(
    ib_ref, jb_ref,          # scalar prefetch
    pi_ref, pj_ref, score_ref, w_ref,
    raw_ref, cnt_ref,
    *, pairwise_del: bool, weighted: bool,
):
    st = pl.program_id(1)

    @pl.when(st == 0)
    def _init():
        raw_ref[:] = jnp.zeros_like(raw_ref)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    Pi = [pi_ref[g] for g in range(3)]  # three [TS, B] planes
    Pj = [pj_ref[g] for g in range(3)]
    dtype = Pi[0].dtype

    vi_m, vi_z = _valid(*Pi, dtype)
    vj_m, vj_z = _valid(*Pj, dtype)
    if pairwise_del:
        vi, vj = vi_m, vj_m
    else:
        # mask only padding; count real sites (missing included)
        vi, vj = vi_z, vj_z

    if weighted:
        # Per-site weights (bootstrap multiplicities x class masks) fold
        # into the i-side validity, entering raw and cnt exactly once —
        # a site of weight w behaves like w aliased copies of itself
        # (the reference's resampling, ngsDist.cpp:416-437), with ONE
        # compiled shape for every replicate.  [TS, 1] broadcasts over
        # the lane (individual) dim on the VPU.
        vi = vi * w_ref[:]

    Qi = [p * vi for p in Pi]
    Qj = [p * vj for p in Pj]
    Yj = [
        score_ref[0, 3 * g + 0] * Qj[0]
        + score_ref[0, 3 * g + 1] * Qj[1]
        + score_ref[0, 3 * g + 2] * Qj[2]
        for g in range(3)
    ]

    # Contract over (g, s): [3TS, B] x [3TS, B] -> [B, B] on the MXU.
    A = jnp.concatenate(Qi, axis=0)
    Bm = jnp.concatenate(Yj, axis=0)
    # HIGHEST: full-f32 MXU passes (default single-pass bf16 rounds the
    # inputs at ~4e-3 relative, visible in final distances; f32 measures
    # 2.5e-7 vs f64 at 21ms/65k-site chunk on v5e — and is still 2x the
    # einsum engine).  NGSDIST_MXU_PRECISION=fast opts into bf16 for
    # throughput-over-accuracy runs (7.3ms/chunk).
    raw_ref[:] += jax.lax.dot_general(
        A, Bm, (((0,), (0,)), ((), ())), preferred_element_type=dtype,
        precision=_PRECISION,
    )
    # The count contraction is EXACT at single-pass bf16 when the
    # operands are {0,1} masks (exactly representable; the MXU
    # accumulates in f32, so per-site counts up to 2^24 carry no
    # rounding).  Weighted counts carry arbitrary multiplicities on the
    # i side, so they pay HIGHEST like the raw contraction.
    cnt_ref[:] += jax.lax.dot_general(
        vi, vj, (((0,), (0,)), ((), ())), preferred_element_type=dtype,
        precision=_PRECISION if weighted else jax.lax.Precision.DEFAULT,
    )


def _upper_blocks(nb: int) -> Tuple[np.ndarray, np.ndarray]:
    iu = np.triu_indices(nb)
    return iu[0].astype(np.int32), iu[1].astype(np.int32)


@functools.partial(
    jax.jit,
    static_argnames=("pairwise_del", "weighted", "block", "site_tile",
                     "interpret", "vma"),
)
def _indep_pallas_padded(
    P3,                      # [3, S_pad, N_pad] plane-major probabilities
    score9,
    w,                       # [S_pad, 1] per-site weights (ignored unless weighted)
    IB, JB, pairwise_del, weighted, block, site_tile, interpret, vma=None
):
    _, S_pad, N_pad = P3.shape
    G = IB.shape[0]
    n_st = S_pad // site_tile
    dtype = P3.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G, n_st),
        in_specs=[
            pl.BlockSpec(
                (3, site_tile, block),
                lambda g, st, IB, JB: (0, st, IB[g]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, site_tile, block),
                lambda g, st, IB, JB: (0, st, JB[g]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (site_tile, 1),
                lambda g, st, IB, JB: (st, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (block, block),
                lambda g, st, IB, JB: (IB[g], JB[g]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block, block),
                lambda g, st, IB, JB: (IB[g], JB[g]),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    kernel = functools.partial(_indep_kernel, pairwise_del=pairwise_del,
                               weighted=weighted)
    # vma: varying-mesh-axes annotation, required when the kernel runs
    # per-device inside shard_map (outputs vary over the shard axis).
    kw = {} if vma is None else {"vma": frozenset(vma)}
    raw, cnt = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N_pad, N_pad), dtype, **kw),
            jax.ShapeDtypeStruct((N_pad, N_pad), dtype, **kw),
        ],
        interpret=interpret,
    )(IB, JB, P3, P3, score9, w)
    return raw, cnt


def indep_raw_cnt_pallas(
    P: jnp.ndarray,
    score,
    pairwise_del: bool,
    site_weights=None,
    *,
    block: int = DEFAULT_BLOCK,
    site_tile: int = DEFAULT_SITE_TILE,
    interpret: bool = False,
    vma=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Independent-path sufficient statistics via the fused kernel.

    P: [S, N, 3] normal-space probabilities.  Returns (raw, cnt) [N, N]
    with valid upper triangle including the diagonal.  cnt counts
    non-missing pairs under pairwise deletion, real sites otherwise.

    site_weights (nonnegative floats: bootstrap multiplicities, class
    masks, or their products) stream as a [site_tile, 1] block scaling
    the i-side mask — every bootstrap replicate reuses ONE compiled
    shape, no gather and no per-replicate recompilation (same contract
    as ops/pallas_em.em_raw_cnt_pallas).  May be a traced array
    (per-device weights under shard_map).
    """
    if interpret and vma is not None:
        raise ValueError(
            "interpret mode cannot run under shard_map (vma requires the "
            "compiled Mosaic path); drop vma or run outside shard_map"
        )
    S, N, _ = P.shape
    dtype = P.dtype
    S_pad = ((S + site_tile - 1) // site_tile) * site_tile
    N_pad = ((N + block - 1) // block) * block
    P3 = jnp.moveaxis(jnp.pad(P, ((0, S_pad - S), (0, N_pad - N), (0, 0))), -1, 0)
    weighted = site_weights is not None
    if weighted:
        w = jnp.pad(jnp.asarray(site_weights, dtype).reshape(-1, 1),
                    ((0, S_pad - S), (0, 0)))
    else:
        w = jnp.ones((S_pad, 1), dtype)
    score9 = jnp.asarray(score, dtype).reshape(1, 9)  # traced-safe
    IB, JB = _upper_blocks(N_pad // block)
    raw, cnt = _indep_pallas_padded(
        P3, score9, w, jnp.asarray(IB), jnp.asarray(JB),
        pairwise_del, weighted, block, site_tile, interpret,
        None if vma is None else tuple(vma),
    )
    return raw[:N, :N], cnt[:N, :N]
