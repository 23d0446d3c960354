"""Persistent XLA compilation cache for the CLI entry points.

TPU compiles of the flagship model run through a remote compiler in this
environment (cold: minutes); JAX's persistent compilation cache makes every
process after the first start warm.  The reference has no analogue (torch
eager), but for a jit-compiled framework the cache is part of the product:
without it every `train.py`/`test.py` invocation — including auto-resume
after a preemption — pays the full compile again.

Honors `JAX_COMPILATION_CACHE_DIR` if the user set one; otherwise defaults
to `~/.jax_tpu_cache` (shared with bench.py and the scripts/ probes).
"""
import os


def enable_persistent_compilation_cache():
    import jax

    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.expanduser(
        "~/.jax_tpu_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # cache anything that took >1s to compile; the default 60s floor
        # skips mid-size programs (eval pipelines) that still cost real
        # time through the remote compiler
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs: run uncached
