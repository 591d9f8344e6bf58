"""Box-constrained quasi-Newton optimization.

The reference vendors a 6k-line Fortran-to-C L-BFGS-B translation
(/root/reference/shared/bfgs.cpp, unlinked in ngsDist; used by sibling
ngsTools for likelihood maximization under bound constraints).  The
TPU-native equivalent composes `jax.grad` with optax's L-BFGS and a
projection onto the box after every step (projected quasi-Newton), all
inside one jitted `lax.while_loop` — no Fortran, no numerical
gradients, and it batches/vmaps like everything else in JAX.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class LbfgsbResult(NamedTuple):
    x: jnp.ndarray
    fun: jnp.ndarray
    n_iter: jnp.ndarray
    converged: jnp.ndarray


def lbfgsb(
    fun: Callable,
    x0: jnp.ndarray,
    lower: Optional[jnp.ndarray] = None,
    upper: Optional[jnp.ndarray] = None,
    max_iter: int = 100,
    tol: float = 1e-8,
    memory_size: int = 10,
) -> LbfgsbResult:
    """Minimize fun(x) subject to lower <= x <= upper.

    Stops when the projected-gradient infinity norm falls below tol or
    after max_iter iterations.  jit-compatible; fun must be
    differentiable by jax.grad.
    """
    dtype = x0.dtype
    lo = -jnp.inf if lower is None else jnp.asarray(lower, dtype)
    hi = jnp.inf if upper is None else jnp.asarray(upper, dtype)

    def project(x):
        return jnp.clip(x, lo, hi)

    x0 = project(x0)
    opt = optax.lbfgs(memory_size=memory_size)
    vg = jax.value_and_grad(fun)

    def pg_norm(x, g):
        # projected gradient: zero where the bound is active and the
        # gradient pushes outward
        pg = jnp.where((x <= lo) & (g > 0), 0.0, g)
        pg = jnp.where((x >= hi) & (g < 0), 0.0, pg)
        return jnp.max(jnp.abs(pg))

    def cond(state):
        it, x, _f, g, _s = state
        return jnp.logical_and(it < max_iter, pg_norm(x, g) > tol)

    def body(state):
        it, x, f, g, opt_state = state
        updates, opt_state = opt.update(
            g, opt_state, x, value=f, grad=g, value_fn=fun
        )
        x = project(optax.apply_updates(x, updates))
        f, g = vg(x)
        return it + 1, x, f, g, opt_state

    f0, g0 = vg(x0)
    it, x, f, g, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), x0, f0, g0, opt.init(x0))
    )
    return LbfgsbResult(x=x, fun=f, n_iter=it, converged=pg_norm(x, g) <= tol)
