"""Persistent XLA compilation cache.

Remote-TPU compiles in this stack take tens of seconds to minutes
(CLAUDE.md), and the round-1 review measured an 8m41s cold-start CLI run
that was almost entirely compilation.  Enabling jax's persistent
compilation cache makes every shape compile once per machine instead of
once per process.

Env knobs:
  NGSDIST_COMPILE_CACHE       cache directory; "0" disables.
                              default ~/.cache/ngsdist_tpu/xla
  NGSDIST_COMPILE_CACHE_MIN   min compile seconds worth caching (default 1)
"""

from __future__ import annotations

import os

_enabled = False


def enable() -> None:
    """Idempotently turn on the persistent compilation cache."""
    global _enabled
    if _enabled:
        return
    target = os.environ.get("NGSDIST_COMPILE_CACHE", "")
    if target == "0":
        return
    if not target:
        target = os.path.join(
            os.path.expanduser("~"), ".cache", "ngsdist_tpu", "xla"
        )
    try:
        import jax

        # TPU-only: CPU compiles are fast, and XLA:CPU persists
        # AOT-compiled code keyed to the build host's CPU features — a
        # VM migration then makes every cache load print a glog warning
        # to stderr (breaking reference stderr parity) before falling
        # back to a fresh compile.
        if jax.default_backend() == "cpu":
            return
        os.makedirs(target, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(os.environ.get("NGSDIST_COMPILE_CACHE_MIN", 1.0)),
        )
        _enabled = True
    except Exception:
        pass  # cache is an optimization; never fail a run over it
