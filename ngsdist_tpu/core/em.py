"""Batched per-(pair, site) joint-genotype EM (JAX).

The reference runs, for every pair at every site, a tiny EM on the 9
joint-genotype weights with a log-likelihood convergence break
(/root/reference/emOptim2.cpp:69-135, called with tole=0.001, maxIter=50
from ngsDist.cpp:349).  Because each (pair, site) problem sees a single
site, the E step reduces to an elementwise reweighting of the 9-vector
by W[g1,g2] = P1[g1]*P2[g2] followed by normalization — a fixed-point
iteration that converges toward a delta on argmax W.

Here the whole population of (pair, site) problems runs as one SIMD
computation: a `lax.while_loop` over EM iterations with per-lane
convergence freezing (converged lanes keep their state, exactly like the
reference's per-problem early break), terminating when every lane has
converged or 50 iterations elapsed.  The per-iteration double
normalization of the reference's emStep2 is reproduced so float64 CPU
results track the exact engine to reduction-order rounding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EM_TOLE = 0.001
EM_MAX_ITER = 50


def em_converged_weights(W: jnp.ndarray) -> jnp.ndarray:
    """Run the per-lane EM to convergence.

    W: [..., 9] nonnegative joint weights (P1 outer P2, flattened row
    major).  Returns sfs [..., 9]: the converged joint-genotype weights.

    Lanes whose W sums to zero (e.g. padded sites) return the uniform
    start unchanged.
    """
    dtype = W.dtype
    shape = W.shape[:-1]
    Wsum_zero = jnp.sum(W, axis=-1) == 0
    Wsafe = jnp.where(Wsum_zero[..., None], jnp.asarray(1.0, dtype), W)

    # Derived from W (not a fresh constant) so that under shard_map the
    # while_loop carry keeps W's varying-axes annotation.
    sfs0 = jnp.zeros_like(Wsafe) + jnp.asarray(1.0 / 9.0, dtype)

    def lik(sfs):
        return jnp.log(jnp.sum(sfs * Wsafe, axis=-1))

    def step(state):
        it, sfs, old_lik, active = state
        inner = sfs * Wsafe
        s1 = jnp.sum(inner, axis=-1, keepdims=True)
        inner = inner / s1
        s2 = jnp.sum(inner, axis=-1, keepdims=True)
        new_sfs = inner / s2
        new_lik = lik(new_sfs)
        # Reference break: update first, then stop if |lik - old| < tole.
        sfs = jnp.where(active[..., None], new_sfs, sfs)
        cur_lik = jnp.where(active, new_lik, old_lik)
        converged = jnp.abs(new_lik - old_lik) < EM_TOLE
        active = active & ~converged
        return it + 1, sfs, cur_lik, active

    def cond(state):
        it, _, _, active = state
        return (it < EM_MAX_ITER) & jnp.any(active)

    init = (
        jnp.asarray(0, jnp.int32),
        sfs0,
        lik(sfs0),
        jnp.ones(shape, dtype=bool) & ~Wsum_zero,
    )
    _, sfs, _, _ = jax.lax.while_loop(cond, step, init)
    return jnp.where(Wsum_zero[..., None], sfs0, sfs)


def em_pair_site_contribs(
    P1: jnp.ndarray, P2: jnp.ndarray, score9: jnp.ndarray
) -> jnp.ndarray:
    """Expected-mismatch contribution per lane under the EM weights.

    P1, P2: [..., 3] normal-space genotype probabilities.
    score9:  [9] flattened score matrix.
    Returns [...] contributions sum(score * sfs).
    """
    W = (P1[..., :, None] * P2[..., None, :]).reshape(P1.shape[:-1] + (9,))
    sfs = em_converged_weights(W)
    return jnp.sum(score9 * sfs, axis=-1)
