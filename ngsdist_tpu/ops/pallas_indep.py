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

_PREC_ENV = _os.environ.get("NGSDIST_MXU_PRECISION", "auto")


def _raw_precision(resident: bool, dtype):
    """Precision scheme for the raw (probability) contraction.

    Returns Precision.* or the string "bf16x3" (3 single-pass bf16 dots
    emulating f32, _dot_bf16x3).  Policy (NGSDIST_MXU_PRECISION):
      fast    — single-pass bf16 (~4e-3 input rounding; throughput-only)
      high    — bf16x3 wherever the dtype is f32
      highest — full f32 MXU passes everywhere
      auto    — resident kernel at f32 uses bf16x3 (measured equivalent
                on v5e: max 1.5e-6 vs f64 for BOTH schemes over 65k-site
                chunks — the error floor is f32 rounding, not MXU passes
                — at ~1.5x the throughput); everything else HIGHEST.
    bf16x3 never applies to f64 (interpret/x64 runs keep bit-level
    HIGHEST exactness)."""
    if _PREC_ENV == "fast":
        return jax.lax.Precision.DEFAULT
    if dtype != jnp.float32:
        return jax.lax.Precision.HIGHEST
    if _PREC_ENV == "high" or (_PREC_ENV == "auto" and resident):
        return "bf16x3"
    return jax.lax.Precision.HIGHEST


def _dot_bf16x3(A, B, dtype):
    """[K, M] x [K, N] -> [M, N] contraction over axis 0 at ~16-bit
    mantissa precision in 3 single-pass bf16 MXU dots.

    Each f32 operand splits as x = hi + lo with hi = bf16(x) (top 8
    mantissa bits) and lo = bf16(x - hi) (next 8); the product keeps
    hi*hi + hi*lo + lo*hi and drops lo*lo (<= 2^-16 relative).  Mosaic
    lowers each bf16 dot with f32 accumulation, so this is the
    bfloat16_3x scheme XLA uses for Precision.HIGH (which Mosaic's
    dot_general does not lower directly)."""
    dims = (((0,), (0,)), ((), ()))
    A_hi = A.astype(jnp.bfloat16)
    B_hi = B.astype(jnp.bfloat16)
    A_lo = (A - A_hi.astype(dtype)).astype(jnp.bfloat16)
    B_lo = (B - B_hi.astype(dtype)).astype(jnp.bfloat16)
    kw = dict(preferred_element_type=dtype,
              precision=jax.lax.Precision.DEFAULT)
    return (jax.lax.dot_general(A_hi, B_hi, dims, **kw)
            + (jax.lax.dot_general(A_hi, B_lo, dims, **kw)
               + jax.lax.dot_general(A_lo, B_hi, dims, **kw)))


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
    prec = _raw_precision(False, dtype)
    if prec == "bf16x3":
        raw_ref[:] += _dot_bf16x3(A, Bm, dtype)
    else:
        raw_ref[:] += jax.lax.dot_general(
            A, Bm, (((0,), (0,)), ((), ())), preferred_element_type=dtype,
            precision=prec,
        )
    # The count contraction is EXACT at single-pass bf16 when the
    # operands are {0,1} masks (exactly representable; the MXU
    # accumulates in f32, so per-site counts up to 2^24 carry no
    # rounding).  Weighted counts carry arbitrary multiplicities on the
    # i side, so they pay HIGHEST like the raw contraction.
    if weighted and prec == "bf16x3":
        cnt_ref[:] += _dot_bf16x3(vi, vj, dtype)
    else:
        cnt_ref[:] += jax.lax.dot_general(
            vi, vj, (((0,), (0,)), ((), ())), preferred_element_type=dtype,
            precision=(prec if weighted else jax.lax.Precision.DEFAULT),
        )


def _upper_blocks(nb: int) -> Tuple[np.ndarray, np.ndarray]:
    iu = np.triu_indices(nb)
    return iu[0].astype(np.int32), iu[1].astype(np.int32)


# Resident-kernel feasibility (measured on v5e, N_pad=1024): a
# [3, 128, 1024] f32 slab + the 2*36 [128,128] resident output blocks
# compile and run (4.05e12 upd/s at bf16x3); site_tile 256 exceeds
# VMEM, and nb > 8 grows the resident outputs past what fits beside the
# slab (nbU scales ~nb^2/2).  SITE_ELEMS = site_tile * N_pad bound.
RESIDENT_MAX_NB = 8
RESIDENT_SITE_ELEMS = 128 * 1024


def plan_layout(S: int, N: int, *, block: int = DEFAULT_BLOCK,
                site_tile: int = DEFAULT_SITE_TILE):
    """Choose the kernel variant and padded layout for an [S, N] problem.

    Returns (use_resident, block, site_tile, S_pad, N_pad).  The
    output-resident kernel is used when the upper-tri output blocks fit
    VMEM (N_pad <= RESIDENT_MAX_NB * block); its site tile shrinks so
    the [3, site_tile, N_pad] slab stays within the measured budget.
    prepare_plane_major and indep_raw_cnt_pallas both call this, so a
    tensor prepared once always matches the dispatcher's plan.
    """
    N_pad = -(-N // block) * block
    nb = N_pad // block
    use_resident = nb <= RESIDENT_MAX_NB
    if use_resident:
        site_tile = min(site_tile, max(128, RESIDENT_SITE_ELEMS // N_pad))
    S_pad = -(-S // site_tile) * site_tile
    return use_resident, block, site_tile, S_pad, N_pad


def prepare_plane_major(P: jnp.ndarray, *, block: int = DEFAULT_BLOCK,
                        site_tile: int = DEFAULT_SITE_TILE):
    """Pad and relayout [S, N, 3] -> [3, S_pad, N_pad] once, for reuse
    across many kernel calls.

    The minor-dim-3 transpose is the most expensive data movement in
    the dispatch (pathological layout change); bootstrap replicates all
    consume the SAME tensor with different site weights, so callers
    should prepare once per chunk and pass the result as
    `indep_raw_cnt_pallas(P3, ..., plane_major=dims)`.

    Returns (P3, dims) with dims = (S, N), the logical (unpadded)
    extents the dispatcher needs back.
    """
    S, N, _ = P.shape
    _, _, _, S_pad, N_pad = plan_layout(S, N, block=block,
                                        site_tile=site_tile)
    P3 = jnp.moveaxis(
        jnp.pad(P, ((0, S_pad - S), (0, N_pad - N), (0, 0))), -1, 0
    )
    return P3, (S, N)


def _resident_kernel(
    pi_ref, score_ref, w_ref,
    raw_ref, cnt_ref,
    *, pairwise_del: bool, weighted: bool, nb: int, block: int,
):
    """Output-resident variant: the grid runs over site tiles only; each
    step loads ONE [3, TS, N_pad] slab and contracts every upper-tri
    block pair against it, accumulating into VMEM-resident [nbU, B, B]
    outputs.  The genotype tensor is read from HBM exactly once per
    chunk (the paired kernel re-reads each block for every partner:
    ~nb x more traffic), and the mask/score-fold VPU work runs once per
    site tile instead of once per pair."""
    st = pl.program_id(0)

    @pl.when(st == 0)
    def _init():
        raw_ref[:] = jnp.zeros_like(raw_ref)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    P = [pi_ref[g] for g in range(3)]  # three [TS, N_pad] planes
    dtype = P[0].dtype

    v_m, v_z = _valid(*P, dtype)
    v = v_m if pairwise_del else v_z
    vi = v * w_ref[:] if weighted else v

    Q = [p * v for p in P]            # j-side (unweighted) operands
    Qi = [p * vi for p in P] if weighted else Q
    Y = [
        score_ref[0, 3 * g + 0] * Q[0]
        + score_ref[0, 3 * g + 1] * Q[1]
        + score_ref[0, 3 * g + 2] * Q[2]
        for g in range(3)
    ]
    A_all = jnp.concatenate(Qi, axis=0)   # [3TS, N_pad]
    B_all = jnp.concatenate(Y, axis=0)

    dims = (((0,), (0,)), ((), ()))
    kw = dict(preferred_element_type=dtype)
    prec = _raw_precision(True, dtype)
    bf16x3 = prec == "bf16x3"
    if bf16x3:
        # Split once per site tile; the pair loop reuses the halves.
        A_hi = A_all.astype(jnp.bfloat16)
        B_hi = B_all.astype(jnp.bfloat16)
        A_lo = (A_all - A_hi.astype(dtype)).astype(jnp.bfloat16)
        B_lo = (B_all - B_hi.astype(dtype)).astype(jnp.bfloat16)
    k = 0
    for ib in range(nb):
        i0 = ib * block
        vi_i = vi[:, i0:i0 + block]
        for jb in range(ib, nb):
            j0 = jb * block
            if bf16x3:
                raw_ref[k] += (
                    jax.lax.dot_general(
                        A_hi[:, i0:i0 + block], B_hi[:, j0:j0 + block],
                        dims, **kw)
                    + (jax.lax.dot_general(
                        A_hi[:, i0:i0 + block], B_lo[:, j0:j0 + block],
                        dims, **kw)
                       + jax.lax.dot_general(
                        A_lo[:, i0:i0 + block], B_hi[:, j0:j0 + block],
                        dims, **kw))
                )
            else:
                raw_ref[k] += jax.lax.dot_general(
                    A_all[:, i0:i0 + block], B_all[:, j0:j0 + block],
                    dims, precision=prec, **kw,
                )
            cnt_ref[k] += jax.lax.dot_general(
                vi_i, v[:, j0:j0 + block], dims,
                precision=(jax.lax.Precision.HIGHEST if weighted
                           else jax.lax.Precision.DEFAULT), **kw,
            )
            k += 1


@functools.partial(
    jax.jit,
    static_argnames=("pairwise_del", "weighted", "block", "site_tile",
                     "interpret", "vma"),
)
def _indep_pallas_resident(
    P3,                      # [3, S_pad, N_pad] plane-major probabilities
    score9,
    w,                       # [S_pad, 1] per-site weights
    pairwise_del, weighted, block, site_tile, interpret, vma=None,
):
    _, S_pad, N_pad = P3.shape
    nb = N_pad // block
    nbU = nb * (nb + 1) // 2
    n_st = S_pad // site_tile
    dtype = P3.dtype

    kernel = functools.partial(
        _resident_kernel, pairwise_del=pairwise_del, weighted=weighted,
        nb=nb, block=block,
    )
    kw = {} if vma is None else {"vma": frozenset(vma)}
    raw_u, cnt_u = pl.pallas_call(
        kernel,
        grid=(n_st,),
        in_specs=[
            pl.BlockSpec((3, site_tile, N_pad), lambda st: (0, st, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((site_tile, 1), lambda st: (st, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nbU, block, block), lambda st: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbU, block, block), lambda st: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nbU, block, block), dtype, **kw),
            jax.ShapeDtypeStruct((nbU, block, block), dtype, **kw),
        ],
        interpret=interpret,
    )(P3, score9, w)

    # Scatter the packed upper-tri blocks into the [N_pad, N_pad] layout
    # the engine consumes (one [nbU*B*B] move per chunk, XLA-fused).
    IB, JB = _upper_blocks(nb)
    raw = jnp.zeros((N_pad, N_pad), dtype)
    cnt = jnp.zeros((N_pad, N_pad), dtype)
    for k in range(nbU):
        i0, j0 = int(IB[k]) * block, int(JB[k]) * block
        raw = jax.lax.dynamic_update_slice(raw, raw_u[k], (i0, j0))
        cnt = jax.lax.dynamic_update_slice(cnt, cnt_u[k], (i0, j0))
    return raw, cnt


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
    plane_major=None,
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

    plane_major: pass (S, N) when P is already the [3, S_pad, N_pad]
    tensor from prepare_plane_major — skips the per-call pad+relayout
    so replicate streams pay it once per chunk.
    """
    if interpret and vma is not None:
        raise ValueError(
            "interpret mode cannot run under shard_map (vma requires the "
            "compiled Mosaic path); drop vma or run outside shard_map"
        )
    if plane_major is not None:
        S, N = plane_major
        if P.ndim != 3 or P.shape[0] != 3:
            raise ValueError("plane_major input must be [3, S_pad, N_pad]")
    else:
        S, N, _ = P.shape
    dtype = P.dtype
    use_resident, block, site_tile, S_pad, N_pad = plan_layout(
        S, N, block=block, site_tile=site_tile
    )
    if plane_major is not None:
        if P.shape[1] != S_pad or P.shape[2] != N_pad:
            raise ValueError(
                f"plane_major input {P.shape} does not match the planned "
                f"layout [3, {S_pad}, {N_pad}] — build it with "
                f"prepare_plane_major(P, block={block}, site_tile={site_tile})"
            )
        P3 = P
    else:
        P3 = jnp.moveaxis(
            jnp.pad(P, ((0, S_pad - S), (0, N_pad - N), (0, 0))), -1, 0
        )
    weighted = site_weights is not None
    if weighted:
        w = jnp.pad(jnp.asarray(site_weights, dtype).reshape(-1, 1),
                    ((0, S_pad - S), (0, 0)))
    else:
        w = jnp.ones((S_pad, 1), dtype)
    score9 = jnp.asarray(score, dtype).reshape(1, 9)  # traced-safe
    if use_resident:
        raw, cnt = _indep_pallas_resident(
            P3, score9, w, pairwise_del, weighted, block, site_tile,
            interpret, None if vma is None else tuple(vma),
        )
        return raw[:N, :N], cnt[:N, :N]
    IB, JB = _upper_blocks(N_pad // block)
    raw, cnt = _indep_pallas_padded(
        P3, score9, w, jnp.asarray(IB), jnp.asarray(JB),
        pairwise_del, weighted, block, site_tile, interpret,
        None if vma is None else tuple(vma),
    )
    return raw[:N, :N], cnt[:N, :N]
