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

Per loaded site-tile slab (both variants keep outputs VMEM-resident and
the slab-prep VPU work runs once per slab, amortized over every block
pair it covers):
    vi[s,a]   = site a valid at s              (miss_data, gen_func.cpp:862-868)
    Qi_g      = Pi_g * vi                      three [TS, W] planes
    Yj_g      = Σ_h score[g,h]·Qj_h            (score fold on the j side)
    raw[a,b] += Σ_{g,s} Qi_g[s,a]·Yj_g[s,b]    — MXU dot, K = 3·TS
    cnt[a,b] += Σ_s vi[s,a]·vj[s,b]            — MXU dot, K = TS

Two variants, chosen by plan_layout:
  resident (N_pad ≤ 1024): grid over site tiles only; the whole
    upper-tri [nbU, B, B] output set stays in VMEM; one HBM read of the
    genotype slab per chunk.
  superblock (larger cohorts): blocks grouped into panels of SUPER_G;
    grid over (upper-tri panel pair, site tile) with a [SB, SB] output
    tile resident; each panel is read nsuper times per chunk instead of
    nb (the per-block-pair paired kernel this replaced).

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


def _raw_precision(dtype):
    """Precision scheme for the raw (probability) contraction.

    Returns Precision.* or the string "bf16x3": each f32 operand splits
    as x = hi + lo with hi = bf16(x) (top 8 mantissa bits) and lo =
    bf16(x − hi) (next 8); the product keeps hi*hi + hi*lo + lo*hi and
    drops lo*lo (≤ 2^-16 relative).  Mosaic lowers each bf16 dot with
    f32 accumulation, so this is the bfloat16_3x scheme XLA uses for
    Precision.HIGH (which Mosaic's dot_general does not lower
    directly).  Policy (NGSDIST_MXU_PRECISION):
      fast    — single-pass bf16 (~4e-3 input rounding; throughput-only)
      auto/high — bf16x3 at f32 (measured equivalent to HIGHEST on v5e:
                max 1.5e-6 vs f64 for BOTH schemes over 65k-site chunks
                — the error floor is f32 rounding, not MXU passes — at
                ~1.5x the throughput)
      highest — full f32 MXU passes everywhere
    bf16x3 never applies to f64 (interpret/x64 runs keep bit-level
    HIGHEST exactness)."""
    if _PREC_ENV == "fast":
        return jax.lax.Precision.DEFAULT
    if dtype != jnp.float32 or _PREC_ENV == "highest":
        return jax.lax.Precision.HIGHEST
    return "bf16x3"


def _valid(P0, P1, P2, dtype):
    nonmiss = (jnp.abs(P0 - P1) >= EPSILON) | (jnp.abs(P1 - P2) >= EPSILON)
    # padded rows are all-zero: treat as missing so cnt excludes them
    nonzero = (P0 + P1 + P2) > 0.0
    return (nonmiss & nonzero).astype(dtype), nonzero.astype(dtype)


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
# Superblock variant (nb > RESIDENT_MAX_NB): panels of SUPER_G blocks;
# VMEM = 2 resident [SB, SB] outputs + double-buffered [3, TS, SB]
# panels + the concat/bf16-split operands, so the site tile is bounded
# by SUPER_SITE_ELEMS = site_tile * SB.  v5e sweep at N=2048 (16k-site
# chunks): (G=4, TS=256) 6.0e12 upd/s > (8,64) 4.6e12 > (8,128) 4.5e12
# > (2,512) 5.6e12* > (8,32) 3.3e12; TS=384+ fails to compile (VMEM).
# Deep site tiles beat wide panels: MXU K = 3*TS dominates, panel
# re-reads are cheap next to it.  (*G=2 re-reads panels 2x more.)
SUPER_G = 4
SUPER_SITE_ELEMS = 256 * 4 * 128


def _super_shape(N: int, block: int):
    """(ns, G, N_pad) for the superblock plan: nb blocks grouped into ns
    panels of G (G chosen so panel padding never exceeds one panel)."""
    nb = -(-N // block)
    ns = -(-nb // SUPER_G)
    G = -(-nb // ns)
    return ns, G, ns * G * block


def plan_layout(S: int, N: int, *, block: int = DEFAULT_BLOCK,
                site_tile: int = DEFAULT_SITE_TILE,
                force_super: bool = False):
    """Choose the kernel variant and padded layout for an [S, N] problem.

    Returns (mode, block, site_tile, S_pad, N_pad) with mode "resident"
    (upper-tri output blocks fit VMEM: N_pad <= RESIDENT_MAX_NB * block)
    or "super" (G-block panels with [SB, SB]-resident outputs).  Either
    way the site tile shrinks so the per-step slab stays within the
    measured VMEM budget.  prepare_plane_major and indep_raw_cnt_pallas
    both call this, so a tensor prepared once always matches the
    dispatcher's plan.

    force_super: panel-sublist callers (the 2-D pairs mesh) always need
    the super variant — its panel-pair grid is what the runtime
    sublists index.
    """
    N_pad = -(-N // block) * block
    nb = N_pad // block
    if nb <= RESIDENT_MAX_NB and not force_super:
        mode = "resident"
        site_tile = min(site_tile, max(128, RESIDENT_SITE_ELEMS // N_pad))
    else:
        mode = "super"
        _, G, N_pad = _super_shape(N, block)
        ts = max(8, (SUPER_SITE_ELEMS // (G * block)) // 8 * 8)
        site_tile = min(site_tile, ts)
    S_pad = -(-S // site_tile) * site_tile
    return mode, block, site_tile, S_pad, N_pad


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


def _fold_operands(P, score_ref, w_ref, pairwise_del: bool, weighted: bool):
    """Shared per-site-tile operand production: validity masks, weight
    fold, probability masking and score fold — the VPU work both
    resident variants run ONCE per loaded slab and reuse across every
    block pair it covers.  P: three [TS, W] planes.  Returns (vi, v,
    A_all, B_all) with A_all/B_all the [3*TS, W] stacked contraction
    operands (raw[a, b] = Σ_{g,s} Qi_g[s,a]·Yj_g[s,b])."""
    v_m, v_z = _valid(*P, P[0].dtype)
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
    A_all = jnp.concatenate(Qi, axis=0)   # [3TS, W]
    B_all = jnp.concatenate(Y, axis=0)
    return vi, v, A_all, B_all


def _make_raw_dot(A_all, B_all, dtype):
    """Closure computing the raw-contraction [B, B] tile for column
    windows (i0, ib) x (j0, jb), under the active precision policy.
    For bf16x3 the operand halves are split ONCE per site tile here and
    reused by every block pair."""
    dims = (((0,), (0,)), ((), ()))
    kw = dict(preferred_element_type=dtype)
    prec = _raw_precision(dtype)
    if prec == "bf16x3":
        A_hi = A_all.astype(jnp.bfloat16)
        B_hi = B_all.astype(jnp.bfloat16)
        A_lo = (A_all - A_hi.astype(dtype)).astype(jnp.bfloat16)
        B_lo = (B_all - B_hi.astype(dtype)).astype(jnp.bfloat16)

        def raw_dot(i0, ib, j0, jb):
            return (
                jax.lax.dot_general(
                    A_hi[:, i0:i0 + ib], B_hi[:, j0:j0 + jb], dims, **kw)
                + (jax.lax.dot_general(
                    A_hi[:, i0:i0 + ib], B_lo[:, j0:j0 + jb], dims, **kw)
                   + jax.lax.dot_general(
                    A_lo[:, i0:i0 + ib], B_hi[:, j0:j0 + jb], dims, **kw))
            )
    else:
        def raw_dot(i0, ib, j0, jb):
            return jax.lax.dot_general(
                A_all[:, i0:i0 + ib], B_all[:, j0:j0 + jb], dims,
                precision=prec, **kw,
            )
    return raw_dot


def _cnt_dot(vi, v, i0, j0, block, weighted, dtype):
    # The count contraction is EXACT at single-pass bf16 when the
    # operands are {0,1} masks (exactly representable; the MXU
    # accumulates in f32, so per-site counts up to 2^24 carry no
    # rounding).  Weighted counts carry arbitrary multiplicities on
    # the i side, so they pay HIGHEST.
    return jax.lax.dot_general(
        vi[:, i0:i0 + block], v[:, j0:j0 + block],
        (((0,), (0,)), ((), ())),
        precision=(jax.lax.Precision.HIGHEST if weighted
                   else jax.lax.Precision.DEFAULT),
        preferred_element_type=dtype,
    )


def _resident_kernel(
    pi_ref, score_ref, w_ref,
    raw_ref, cnt_ref,
    *, pairwise_del: bool, weighted: bool, nb: int, block: int,
):
    """Output-resident variant: the grid runs over site tiles only; each
    step loads ONE [3, TS, N_pad] slab and contracts every upper-tri
    block pair against it, accumulating into VMEM-resident [nbU, B, B]
    outputs.  The genotype tensor is read from HBM exactly once per
    chunk, and the mask/score-fold VPU work runs once per site tile
    instead of once per pair."""
    st = pl.program_id(0)

    @pl.when(st == 0)
    def _init():
        raw_ref[:] = jnp.zeros_like(raw_ref)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    P = [pi_ref[g] for g in range(3)]  # three [TS, N_pad] planes
    dtype = P[0].dtype
    vi, v, A_all, B_all = _fold_operands(P, score_ref, w_ref,
                                         pairwise_del, weighted)
    raw_dot = _make_raw_dot(A_all, B_all, dtype)
    k = 0
    for ib in range(nb):
        i0 = ib * block
        for jb in range(ib, nb):
            j0 = jb * block
            raw_ref[k] += raw_dot(i0, block, j0, block)
            cnt_ref[k] += _cnt_dot(vi, v, i0, j0, block, weighted, dtype)
            k += 1


def _super_kernel(
    is_ref, js_ref,            # scalar prefetch: super-pair panel ids
    pi_ref, pj_ref, score_ref, w_ref,
    raw_ref, cnt_ref,
    *, pairwise_del: bool, weighted: bool, G: int, block: int,
):
    """Superblock variant for cohorts whose full output triangle exceeds
    VMEM: blocks are grouped into panels of G; the grid enumerates
    upper-triangular PANEL pairs (scalar-prefetched) with sites
    innermost, keeping one [SB, SB] output tile resident per panel pair
    (SB = G*block).  Each step loads two [3, TS, SB] panels, runs the
    mask/score-fold prep once per panel (amortized over the G*G block
    pairs it covers — the round-1 paired kernel redid it per pair, nb/G
    times more VPU work), and skips the sub-diagonal block pairs of
    diagonal panel pairs behind a scalar branch."""
    sp = pl.program_id(0)
    st = pl.program_id(1)

    @pl.when(st == 0)
    def _init():
        raw_ref[:] = jnp.zeros_like(raw_ref)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    off_diag = is_ref[sp] != js_ref[sp]

    Pi = [pi_ref[g] for g in range(3)]  # three [TS, SB] planes
    Pj = [pj_ref[g] for g in range(3)]
    dtype = Pi[0].dtype
    vi, _vj_w, A_i, _B_i = _fold_operands(Pi, score_ref, w_ref,
                                          pairwise_del, weighted)
    _vi_j, vj, _A_j, B_j = _fold_operands(Pj, score_ref, w_ref,
                                          pairwise_del, False)
    raw_dot = _make_raw_dot(A_i, B_j, dtype)
    for gi in range(G):
        i0 = gi * block
        for gj in range(G):
            j0 = gj * block

            def _acc(i0=i0, j0=j0):
                raw_ref[0, i0:i0 + block, j0:j0 + block] += raw_dot(
                    i0, block, j0, block
                )
                cnt_ref[0, i0:i0 + block, j0:j0 + block] += _cnt_dot(
                    vi, vj, i0, j0, block, weighted, dtype
                )

            if gj >= gi:
                _acc()                       # needed on every panel pair
            else:
                pl.when(off_diag)(_acc)      # diagonal panels: upper only


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
    static_argnames=("pairwise_del", "weighted", "G", "block", "site_tile",
                     "interpret", "vma"),
)
def _indep_pallas_super(
    P3,                      # [3, S_pad, N_pad] plane-major probabilities
    score9,
    w,                       # [S_pad, 1] per-site weights
    pairwise_del, weighted, G, block, site_tile, interpret, vma=None,
    panels=None,             # optional runtime (IS, JS) panel sublist
):
    _, S_pad, N_pad = P3.shape
    sb = G * block
    ns = N_pad // sb
    if panels is None:
        ISh, JSh = _upper_blocks(ns)  # host-side: panel-pair enumeration
        IS, JS = jnp.asarray(ISh), jnp.asarray(JSh)
        n_sp = ISh.shape[0]
    else:
        # Runtime panel-pair sublist (scalar-prefetch values, so every
        # sublist shares ONE compiled kernel): a pairs-axis device
        # computes only its balanced share of the upper-tri panels.
        # Padding entries point at panel (1, 0) — real compute, strictly
        # lower-triangular, discarded by the caller's triu.
        ISh = JSh = None
        IS, JS = panels
        n_sp = IS.shape[0]
    n_st = S_pad // site_tile
    dtype = P3.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_sp, n_st),
        in_specs=[
            pl.BlockSpec(
                (3, site_tile, sb),
                lambda sp, st, IS, JS: (0, st, IS[sp]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, site_tile, sb),
                lambda sp, st, IS, JS: (0, st, JS[sp]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (site_tile, 1),
                lambda sp, st, IS, JS: (st, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, sb, sb),
                lambda sp, st, IS, JS: (sp, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, sb, sb),
                lambda sp, st, IS, JS: (sp, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    kernel = functools.partial(_super_kernel, pairwise_del=pairwise_del,
                               weighted=weighted, G=G, block=block)
    # vma: varying-mesh-axes annotation, required when the kernel runs
    # per-device inside shard_map (outputs vary over the shard axis).
    kw = {} if vma is None else {"vma": frozenset(vma)}
    raw_u, cnt_u = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_sp, sb, sb), dtype, **kw),
            jax.ShapeDtypeStruct((n_sp, sb, sb), dtype, **kw),
        ],
        interpret=interpret,
    )(IS, JS, P3, P3, score9, w)

    # Scatter the packed upper-tri panel tiles into [N_pad, N_pad]
    # (n_sp slice moves per chunk; sub-diagonal blocks of diagonal
    # panels were never written and stay zero).  With a runtime panel
    # sublist the offsets are traced scalars (dynamic_update_slice
    # accepts them); padding entries land in the strictly-lower panel
    # (1, 0) and are dropped by the caller's triu.
    raw = jnp.zeros((N_pad, N_pad), dtype)
    cnt = jnp.zeros((N_pad, N_pad), dtype)
    for k in range(n_sp):
        if ISh is not None:
            i0, j0 = int(ISh[k]) * sb, int(JSh[k]) * sb
        else:
            i0, j0 = IS[k] * sb, JS[k] * sb
        raw = jax.lax.dynamic_update_slice(raw, raw_u[k], (i0, j0))
        cnt = jax.lax.dynamic_update_slice(cnt, cnt_u[k], (i0, j0))
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
    panels=None,
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

    panels: optional (IS, JS) int32 [L] arrays — a runtime SUBLIST of
    upper-triangular superblock-panel pairs to compute instead of the
    full enumeration (the 2-D pairs-mesh TP split: each pairs-
    coordinate computes a balanced share; scalar-prefetch values, so
    all sublists share one compiled kernel).  Forces the super variant.
    Padding entries must point at panel (1, 0): real compute, strictly
    lower-triangular, dropped by the caller's triu — so panels requires
    N_pad > one superblock (ns >= 2).  Only the listed panels of the
    returned matrices are valid; the caller is responsible for triu +
    cross-device summation.
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
    mode, block, site_tile, S_pad, N_pad = plan_layout(
        S, N, block=block, site_tile=site_tile,
        force_super=panels is not None,
    )
    if panels is not None and _super_shape(N, block)[0] < 2:
        raise ValueError(
            "panels sublists need ns >= 2 superblocks (the (1, 0) padding "
            f"panel must be strictly lower-triangular): N_pad={N_pad}"
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
    vma_t = None if vma is None else tuple(vma)
    if mode == "resident":
        raw, cnt = _indep_pallas_resident(
            P3, score9, w, pairwise_del, weighted, block, site_tile,
            interpret, vma_t,
        )
    else:
        _, G, _ = _super_shape(N, block)
        raw, cnt = _indep_pallas_super(
            P3, score9, w, pairwise_del, weighted, G, block, site_tile,
            interpret, vma_t,
            panels=(None if panels is None
                    else (jnp.asarray(panels[0], jnp.int32),
                          jnp.asarray(panels[1], jnp.int32))),
        )
    return raw[:N, :N], cnt[:N, :N]
