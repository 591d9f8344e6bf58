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
output block (zero-initialised on the first site tile).  W is RANK-1
(W[g,h] = P1[g]·P2[h]), so its power sums factorize per individual:
the 9-channel power recurrences collapse to [sub, B] per-individual
t_k = Σ_g p_g^k sequences, and the pair lanes only see a one-multiply
convergence-ratio test per iteration (see _em_slab).  The while_loop
exits as soon as every lane in the tile has converged.

Numerics vs the reference: identical update order, convergence rule and
iteration cap; differs only by the exact normalization arithmetic
(rounding-level) — the bit-exact contract is carried by the CPU engine
(core/exact.py), and tests pin this kernel to the batched JAX EM
(core/em.py) at float tolerance.

Speed of light: the kernel is VMEM-issue-bound on its per-step [B, B]
mask-chain state (a [256, 256] f32 array is 64 vregs — far over the
register file — so each of the ~4 vector ops/lane/step streams through
VMEM at ~2.3 cycles/vreg-op).  Round-4 roofline measurements (forced
7- vs 49-step runs, six structural variants incl. a bit-identical
single-carry form that regressed 30% under the production scoped-VMEM
limit) put the current form at Mosaic's codegen floor for this
algorithm — see docs/OPERATIONS.md "EM kernel roofline" for the full
numbers before attempting to optimize this loop again.
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

# TPU tiling: the [B, B] output block's last dim must be a 128
# multiple.  B=256 amortizes the per-individual [sub, B] recurrence
# work and the while-loop's per-iteration overhead over 4x the pair
# lanes of B=128: round-3 v5e sweep at 1024 ind, sub=1, chunk=7:
# B=256 2.10e9 > B=128 1.50e9 upd/s; B=512 exceeds the 16 MB scoped
# VMEM (26.95M).  Cohorts within one 128-block keep B=128
# (choose_block) — less padding for tiny N.  site_tile is the DMA
# granularity per grid step; its sublane position in the [TS, B, 3] /
# [TS, 1] blocks must be 8-divisible (Mosaic block constraint), so
# TS=8.  sub_tile is the inner COMPUTE slab: since the rank-1
# factorization removed the [9, sub, B, B] while-carry the slab arrays
# are just [sub, B, B].  The convergence loop runs EM_CHUNK steps per
# while iteration (round-2 sweep: per-step exit 8.7e8 < chunk-7 1.48e9
# > fixed 49 steps 7.2e8; the round-3 separable-max cond made the
# check ~free but the per-iteration while overhead still favors
# chunk=7 — chunk=1 measured 0.96e9); smaller slabs exit earlier
# (slab-max convergence over fewer lanes): sub=1 1.50e9 > sub=2
# 1.43e9 at B=128 (2.10 vs 2.0e9 at 256).
DEFAULT_BLOCK = 256
DEFAULT_SITE_TILE = 8
DEFAULT_SUB_TILE = 1


def choose_block(N: int) -> int:
    """Individual-block size for an N-individual cohort: one 128-block
    when the cohort fits it (minimal padding for small N), else the
    throughput-optimal DEFAULT_BLOCK.  The mesh pair-block tables and
    the kernel dispatcher must agree, so both call this."""
    return 128 if N <= 128 else DEFAULT_BLOCK
# 7 | EM_MAX_ITER - 1, so chunked exit checks preserve the exact
# 49-step iteration cap of the reference (maxIter=50, ngsDist.cpp:349).
EM_CHUNK = 7


def _em_slab(Pi, Pj, score_ref, pairwise_del: bool):
    """EM-converged expected-mismatch contributions for one compute slab.

    Pi, Pj: [sub, B, 3] normal-space probabilities.  Returns
    (contrib, m): per-lane score-weighted sfs sums and validity masks,
    both [sub, B, B].

    The 9-cell weight matrix is RANK-1: W[g,h] = Pi[g]·Pj[h], so its
    power sums factorize per individual — S_k(a,b) = Σ_{g,h} W^k
    = tI_k[a]·tJ_k[b] with t_k = Σ_g p_g^k — and the reference's
    convergence ratio (S_{k+1}·S_{k−1})/S_k² (emOptim2.cpp:112-135; the
    test |l_k − l_{k−1}| < tole on l_k = log S_{k+1} − log S_k) becomes
    rI_k[a]·rJ_k[b] with r_k = t_{k+1}·t_{k−1}/t_k².  The power
    recurrences run on [sub, B] per-INDIVIDUAL arrays (O(B) work); only
    the 1-multiply ratio test touches the [sub, B, B] pair lanes — ~3x
    fewer VPU ops per iteration than advancing the 9-channel W^k state
    per pair, and no [9, sub, B, B] while-carry.  Normalizing each
    side by its max channel keeps t_k ≥ 1 (the per-lane scale
    (mi·mj)^k cancels exactly in the ratio).
    """
    dtype = Pi.dtype

    mi = jnp.max(Pi, axis=2)                         # [sub, B]
    mj = jnp.max(Pj, axis=2)
    dead_i = mi <= 0.0                               # padded / all-zero
    dead_j = mj <= 0.0
    pi = [Pi[:, :, g] / jnp.where(dead_i, 1.0, mi) for g in range(3)]
    pj = [Pj[:, :, h] / jnp.where(dead_j, 1.0, mj) for h in range(3)]
    dead = dead_i[:, :, None] | dead_j[:, None, :]   # [sub, B, B]

    hi = jnp.asarray(np.exp(EM_TOLE), dtype)

    # Step invariant entering step k (k = 1, 2, …): PowI_g = pi_g^k,
    # tIm = t_{k−1}, tIc = t_k (same on the j side).  Each step advances
    # the per-individual powers one k ahead, forms the pair ratio, and
    # counts still-active steps into kstar: a lane first converging at
    # step k_c accumulates Σ active = k_c − 1, so k* = 1 + Σ — no
    # per-lane select in the loop.  Never-converged lanes run all
    # EM_MAX_ITER − 1 steps and land on the reference's iteration cap.
    # The band test needs only the UPPER edge: power sums are log-convex
    # in k (Cauchy–Schwarz: S_{k+1}·S_{k−1} ≥ S_k²), so rI, rJ and the
    # pair ratio are ≥ 1 > exp(−tole) exactly — the reference's
    # |l_k − l_{k−1}| < tole collapses to ratio < hi, one compare.
    # Masks are {0,1} floats (Mosaic-friendlier than i1 vectors).
    #
    # Early exit: ratios are nonnegative, so the slab's worst lane is
    # SEPARABLE — max_{a,b} rI[a]·rJ[b] = (max_a rI)·(max_b rJ) — and
    # the whole-slab continue test is an O(B) per-individual max, not a
    # [sub, B, B] reduction (dead lanes are masked to 0 so they never
    # poison the max with 0·3/0 NaNs).  That makes the exit check ~free
    # and the while cond exact at EVERY chunk boundary.
    def step(PI, tIm, tIc, PJ, tJm, tJc, ksum, active):
        PI = [p * q for p, q in zip(PI, pi)]         # pi^{k+1}, [sub, B]
        PJ = [p * q for p, q in zip(PJ, pj)]
        tIn = PI[0] + PI[1] + PI[2]                  # t_{k+1}
        tJn = PJ[0] + PJ[1] + PJ[2]
        rI = jnp.where(dead_i, 0.0, tIn * tIm / (tIc * tIc))  # [sub, B]
        rJ = jnp.where(dead_j, 0.0, tJn * tJm / (tJc * tJc))
        ratio = rI[:, :, None] * rJ[:, None, :]      # [sub, B, B]
        active = active * (ratio >= hi).astype(dtype)
        mprod = jnp.max(rI) * jnp.max(rJ)            # scalar, exact
        return PI, tIc, tIn, PJ, tJc, tJn, ksum + active, active, mprod

    # EM_CHUNK steps run per while iteration; the separable-max cond is
    # cheap enough to evaluate at every chunk boundary (the round-2
    # [sub, B, B] sum-reduction check cost ~35% when run per step).
    n_steps = EM_MAX_ITER - 1
    assert n_steps % EM_CHUNK == 0

    def cond(state):
        return jnp.logical_and(state[0] < n_steps, state[-1] >= hi)

    def body(state):
        k, PI, tIm, tIc, PJ, tJm, tJc, ksum, active, _mp = state
        for _ in range(EM_CHUNK):
            PI, tIm, tIc, PJ, tJm, tJc, ksum, active, mp = step(
                PI, tIm, tIc, PJ, tJm, tJc, ksum, active)
        return (k + EM_CHUNK, PI, tIm, tIc, PJ, tJm, tJc, ksum, active, mp)

    tI1 = pi[0] + pi[1] + pi[2]
    tJ1 = pj[0] + pj[1] + pj[2]
    t0 = jnp.full_like(tI1, 3.0)
    active0 = 1.0 - dead.astype(dtype)
    _, _, _, _, _, _, _, ksum, _, _ = jax.lax.while_loop(
        cond,
        body,
        (jnp.asarray(0, jnp.int32), list(pi), t0, tI1, list(pj), t0, tJ1,
         jnp.zeros_like(active0), active0, jnp.asarray(np.inf, dtype)),
    )
    kstar = 1.0 + ksum                               # [sub, B, B]

    # sfs ∝ W^{k*} = (pi_g·pj_h)^{k*}: x_g = exp(k*·ln pi_g) per side
    # (ln 0 = −inf → exp(−inf·k*) = 0, the value those channels converge
    # to; the max channel is exactly 1), folded through the score as the
    # bilinear form Σ_g x_g·(Σ_h score[g,h]·y_h), with the normalizer
    # S_{k*} = (Σ x)(Σ y).
    x = [jnp.exp(kstar * jnp.log(pi[g])[:, :, None]) for g in range(3)]
    y = [jnp.exp(kstar * jnp.log(pj[h])[:, None, :]) for h in range(3)]
    num = jnp.zeros_like(kstar)
    for g in range(3):
        z = (score_ref[0, 3 * g + 0] * y[0]
             + score_ref[0, 3 * g + 1] * y[1]
             + score_ref[0, 3 * g + 2] * y[2])
        num = num + x[g] * z
    Sf = (x[0] + x[1] + x[2]) * (y[0] + y[1] + y[2])
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
    block: Optional[int] = None,
    site_tile: int = DEFAULT_SITE_TILE,
    sub_tile: int = DEFAULT_SUB_TILE,
    interpret: bool = False,
    vma=None,
    blocks: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
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

    blocks: optional (IB, JB) int32 [G] arrays replacing the full
    upper-triangular block enumeration — a SUBSET of blocks to compute
    (the pairs-axis TP path gives each device its own sublist).  The
    lists are runtime scalar-prefetch values, so per-device contents
    share one compiled kernel; only blocks named in the list are
    written, everything else in the output is unread garbage.  Pad
    unequal list lengths with the lower-triangle block (1, 0) — real
    compute, never read, and distinct from every valid (upper) entry.
    """
    if site_tile % sub_tile:
        raise ValueError("site_tile must be a multiple of sub_tile")
    S, N, _ = P.shape
    if block is None:
        block = choose_block(N)
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
    if blocks is not None:
        IB, JB = blocks
    else:
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
