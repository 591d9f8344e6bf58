"""Pallas TPU kernel for the pairwise-EM distance path.

The reference runs a tiny 9-cell EM per (pair, site) with an early
log-likelihood break (/root/reference/emOptim2.cpp:91-135, tole=0.001,
maxIter=50 from ngsDist.cpp:349).  Because each problem sees one site,
the E step is an elementwise reweighting: sfs_{t+1} ∝ sfs_t ⊙ W with
W[g,h] = P1[g]·P2[h].  Hence sfs_t ∝ W^t elementwise, and the reference
loglik after step t is l_t = log S_{t+1} − log S_t with S_t = Σ_k W_k^t —
so the convergence test |l_t − l_{t−1}| < tole is a *ratio* test on
successive sums, and the whole EM needs no normalization at all if W is
first scaled by its max (scale cancels in both sfs and the test; max
entry 1 keeps S_t ≥ 1, and f32 underflow of the losing cells only drives
them to the 0 they converge to anyway).

Kernel shape: individuals are tiled into BxB blocks; a scalar-prefetch
table enumerates only the upper-triangular block pairs; sites stream as
the innermost grid dimension, accumulating into the resident [B, B]
output block (zero-initialised on the first site tile).  The 9
genotype-combination channels sit on a *leading* axis so every reduction
is 8 VPU adds over [TS·B, B] lane-aligned tiles; the inner while_loop
does ~22 flops/lane/iteration with per-lane convergence freezing and
exits as soon as every lane in the tile has converged.

Numerics vs the reference: identical update order, convergence rule and
iteration cap; differs only by the exact normalization arithmetic
(rounding-level) — the bit-exact contract is carried by the CPU engine
(core/exact.py), and tests pin this kernel to the batched JAX EM
(core/em.py) at float tolerance.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EM_TOLE = 0.001
EM_MAX_ITER = 50
EPSILON = 1e-5  # miss_data tolerance (gen_func.hpp:16)

# TPU tiling: the [B, B] output block's last dim must be a multiple of
# 128, so B=128.  site_tile is the DMA granularity per grid step; its
# sublane position in the [TS, B, 3] / [TS, 1] blocks must be
# 8-divisible (Mosaic block constraint), so TS=8.  sub_tile is the
# inner COMPUTE slab: it bounds the three [9, sub, B, B] f32 work
# arrays (W, the while-carry P, its update) against the 16 MB
# scoped-VMEM limit, and sub=2 measures ~8% faster than sub=4 on v5e
# (smaller slabs exit the convergence while_loop sooner).
DEFAULT_BLOCK = 128
DEFAULT_SITE_TILE = 8
DEFAULT_SUB_TILE = 2


def _em_slab(Pi, Pj, score_ref, pairwise_del: bool):
    """EM-converged expected-mismatch contributions for one compute slab.

    Pi, Pj: [sub, B, 3] normal-space probabilities.  Returns
    (contrib, m): per-lane score-weighted sfs sums and validity masks,
    both [sub, B, B]."""
    dtype = Pi.dtype

    # W[g*3+h, s, a, b] = Pi[s, a, g] * Pj[s, b, h]: 9 outer products.
    cols_i = [Pi[:, :, g][:, :, None] for g in range(3)]   # [sub, B, 1]
    rows_j = [Pj[:, :, h][:, None, :] for h in range(3)]   # [sub, 1, B]
    W = jnp.stack(
        [cols_i[g] * rows_j[h] for g in range(3) for h in range(3)], axis=0
    )  # [9, sub, B, B]

    wmax = jnp.max(W, axis=0)                       # [sub, B, B]
    dead = wmax <= 0.0                              # padded / all-zero lanes
    Wn = W / jnp.where(dead, 1.0, wmax)[None]       # max entry 1 per live lane

    lo = jnp.asarray(np.exp(-EM_TOLE), dtype)
    hi = jnp.asarray(np.exp(EM_TOLE), dtype)

    # With S_t = Σ_k Wn_k^t (S_0 = 9), sfs after k EM steps is Wn^k/S_k
    # and its loglik is l_k = log(S_{k+1}/S_k).  The reference updates
    # first and breaks on |l_k − l_{k−1}| < tole keeping sfs_k
    # (emOptim2.cpp:112-135), i.e. the test ratio is
    # (S_{k+1}·S_{k−1})/S_k².
    #
    # Instead of freezing the 9-channel state per lane (a 9-wide select
    # every iteration), the loop advances P = Wn^k unconditionally and
    # only RECORDS each lane's stop step k*; the kept sfs is
    # reconstructed once at the end as Wn^{k*} = exp(k*·ln Wn) — ~30%
    # fewer ops in the hot loop, identical stop semantics.  Masks are
    # carried as {0,1} floats (Mosaic-friendlier than i1 vectors);
    # n_active lets the loop exit as soon as the whole tile converged.
    def cond(state):
        k, _P, _S_cur, _S_prev, _kstar, _active, n_active = state
        return jnp.logical_and(k < EM_MAX_ITER, n_active > 0.0)

    def body(state):
        k, P, S_cur, S_prev, kstar, active, _na = state
        P = P * Wn                                   # [9, sub, B, B]
        S_next = jnp.sum(P, axis=0)
        ratio = (S_next * S_prev) / (S_cur * S_cur)  # e^{l_k - l_{k-1}}
        conv = ((ratio > lo) & (ratio < hi)).astype(dtype)
        newly = active * conv
        kstar = jnp.where(newly > 0.0, k.astype(dtype), kstar)
        active = active * (1.0 - conv)
        return k + 1, P, S_next, S_cur, kstar, active, jnp.sum(active)

    P1 = Wn                                          # after EM step 1
    S1 = jnp.sum(Wn, axis=0)
    S0 = jnp.full_like(S1, 9.0)
    active0 = 1.0 - dead.astype(dtype)
    kstar0 = jnp.full_like(S1, float(EM_MAX_ITER))   # never-converged cap
    _, _, _, _, kstar, _, _ = jax.lax.while_loop(
        cond,
        body,
        (jnp.asarray(1, jnp.int32), P1, S1, S0, kstar0, active0,
         jnp.sum(active0)),
    )

    # sfs ∝ Wn^{k*} = exp(k*·ln Wn); ln 0 = -inf -> exp(-inf·k) = 0, the
    # value those channels converge to.  Max channel is exactly 1.
    lnW = jnp.log(Wn)
    Sf = jnp.zeros_like(S1)
    num = jnp.zeros_like(S1)
    for k in range(9):
        Pk = jnp.exp(kstar * lnW[k])
        Sf = Sf + Pk
        num = num + score_ref[0, k] * Pk
    contrib = jnp.where(dead, 0.0, num / Sf)         # [sub, B, B]

    # Site/individual padding is all-zero probability -> dead lanes;
    # excluding them reproduces the site mask without a weights input.
    m = 1.0 - dead.astype(dtype)
    if pairwise_del:
        def valid(Pv):
            d01 = jnp.abs(Pv[:, :, 0] - Pv[:, :, 1])
            d12 = jnp.abs(Pv[:, :, 1] - Pv[:, :, 2])
            return ((d01 >= EPSILON) | (d12 >= EPSILON)).astype(dtype)
        m = m * valid(Pi)[:, :, None] * valid(Pj)[:, None, :]
    return contrib, m


def _em_kernel(
    # scalar prefetch
    ib_ref, jb_ref,
    # inputs
    pi_ref, pj_ref, score_ref, w_ref,
    # outputs
    raw_ref, cnt_ref,
    *, pairwise_del: bool, sub_tile: int,
):
    st = pl.program_id(1)

    @pl.when(st == 0)
    def _init():
        raw_ref[:] = jnp.zeros_like(raw_ref)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    Pi_all = pi_ref[:]  # [TS, B, 3] DMA block
    Pj_all = pj_ref[:]
    TS = Pi_all.shape[0]

    # Per-site weights (bootstrap multiplicities, class masks) multiply
    # both the contribution and the valid count: a site of weight w
    # behaves exactly like w aliased copies of itself — the reference's
    # resampling semantics (ngsDist.cpp:416-437) with no data movement
    # and ONE compiled shape for every replicate.  The [TS, 1] weight
    # block lives in SMEM (a scalar-per-site has no useful lane layout)
    # and scales each site's [B, B] plane by a scalar read, unrolled
    # over the static tile.  The EM itself runs on sub_tile-site slabs
    # so the [9, sub, B, B] work arrays stay inside scoped VMEM even
    # though the DMA block carries 8 sites (Mosaic's sublane-granule
    # minimum for a blocked site axis).
    raw_acc = None
    cnt_acc = None
    for s0 in range(0, TS, sub_tile):
        contrib, m = _em_slab(
            Pi_all[s0:s0 + sub_tile], Pj_all[s0:s0 + sub_tile],
            score_ref, pairwise_del,
        )
        cm = contrib * m
        for s in range(sub_tile):
            w = w_ref[s0 + s, 0]
            r = w * cm[s]
            c = w * m[s]
            raw_acc = r if raw_acc is None else raw_acc + r
            cnt_acc = c if cnt_acc is None else cnt_acc + c
    raw_ref[:] += raw_acc
    cnt_ref[:] += cnt_acc


def _upper_blocks(nb: int) -> Tuple[np.ndarray, np.ndarray]:
    iu = np.triu_indices(nb)
    return iu[0].astype(np.int32), iu[1].astype(np.int32)


@functools.partial(
    jax.jit,
    static_argnames=("pairwise_del", "block", "site_tile", "sub_tile",
                     "interpret", "vma"),
)
def _em_pallas_padded(
    P_pad: jnp.ndarray,        # [S_pad, N_pad, 3]
    score9: jnp.ndarray,       # [1, 9]
    w_pad: jnp.ndarray,        # [S_pad, 1] per-site weights
    IB: jnp.ndarray,           # [G] upper-block row ids
    JB: jnp.ndarray,           # [G] upper-block col ids
    pairwise_del: bool,
    block: int,
    site_tile: int,
    sub_tile: int,
    interpret: bool,
    vma=None,
):
    S_pad, N_pad, _ = P_pad.shape
    G = IB.shape[0]
    n_st = S_pad // site_tile
    dtype = P_pad.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G, n_st),
        in_specs=[
            pl.BlockSpec(
                (site_tile, block, 3),
                lambda g, st, IB, JB: (st, IB[g], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (site_tile, block, 3),
                lambda g, st, IB, JB: (st, JB[g], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (site_tile, 1),
                lambda g, st, IB, JB: (st, 0),
                memory_space=pltpu.SMEM,
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

    kernel = functools.partial(_em_kernel, pairwise_del=pairwise_del,
                               sub_tile=sub_tile)
    # vma: varying-mesh-axes annotation for per-device use in shard_map.
    kw = {} if vma is None else {"vma": frozenset(vma)}
    raw, cnt = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N_pad, N_pad), dtype, **kw),
            jax.ShapeDtypeStruct((N_pad, N_pad), dtype, **kw),
        ],
        interpret=interpret,
    )(IB, JB, P_pad, P_pad, score9, w_pad)
    return raw, cnt


def em_raw_cnt_pallas(
    P: jnp.ndarray,
    score9,
    pairwise_del: bool,
    site_weights: Optional[np.ndarray] = None,
    *,
    block: int = DEFAULT_BLOCK,
    site_tile: int = DEFAULT_SITE_TILE,
    sub_tile: int = DEFAULT_SUB_TILE,
    interpret: bool = False,
    vma=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """EM-path sufficient statistics via the Pallas kernel.

    P: [S, N, 3] normal-space probabilities.  Returns (raw, cnt) as
    [N, N] arrays whose strict upper triangle is valid (lower triangle
    and diagonal are never written by the block enumeration).

    site_weights (any nonnegative floats: bootstrap multiplicities,
    substitution-class masks, or their products) stream through the
    kernel as a [site_tile, 1] SMEM block, so every replicate of a
    bootstrap run reuses ONE compiled kernel shape — no gather, no
    per-replicate recompilation.  May be a traced array (per-device
    weights under shard_map).
    """
    if site_tile % sub_tile:
        raise ValueError("site_tile must be a multiple of sub_tile")
    S, N, _ = P.shape
    dtype = P.dtype
    S_pad = ((S + site_tile - 1) // site_tile) * site_tile
    N_pad = ((N + block - 1) // block) * block
    P_pad = jnp.pad(P, ((0, S_pad - S), (0, N_pad - N), (0, 0)))
    if site_weights is None:
        w_pad = jnp.ones((S_pad, 1), dtype)
    else:
        w_pad = jnp.pad(
            jnp.asarray(site_weights, dtype).reshape(-1, 1),
            ((0, S_pad - S), (0, 0)),
        )
    score9 = jnp.asarray(score9, dtype).reshape(1, 9)
    IB, JB = _upper_blocks(N_pad // block)
    if interpret and vma is not None:
        raise ValueError(
            "interpret mode cannot run under shard_map (vma requires the "
            "compiled Mosaic path); drop vma or run outside shard_map"
        )
    raw, cnt = _em_pallas_padded(
        P_pad, score9, w_pad, jnp.asarray(IB), jnp.asarray(JB),
        pairwise_del, block, site_tile, sub_tile, interpret,
        None if vma is None else tuple(vma),
    )
    return raw[:N, :N], cnt[:N, :N]
