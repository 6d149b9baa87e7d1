"""Persistent XLA compilation cache.

The walk engines compile into large programs (the queued hub walker
inlines ``unroll * flush_every`` round bodies into one ``while_loop``),
and in remote-compile environments a cold compile of the full pipeline
costs minutes of wall clock per process. The reference has no analogue
(Numba caches its JIT output in ``__pycache__`` automatically); this is
the JAX equivalent — compiled executables persist across processes, so
the second run of any pipeline skips XLA entirely.

Enabled by the CLI, ``Base`` construction, and the benchmarks. Opt out
with ``PECANPY_TPU_COMPILE_CACHE=0``; point somewhere else with
``PECANPY_TPU_COMPILE_CACHE_DIR``. A user-configured
``jax_compilation_cache_dir`` is always left untouched.
"""
import os

_done = False


def enable_compilation_cache() -> None:
    """Idempotently point JAX's persistent compilation cache at a
    per-user directory (``~/.cache/pecanpy_tpu/xla``)."""
    global _done
    if _done:
        return
    _done = True
    if os.environ.get("PECANPY_TPU_COMPILE_CACHE", "1") == "0":
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        return  # user already configured a cache; respect it
    path = os.environ.get("PECANPY_TPU_COMPILE_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "pecanpy_tpu", "xla"
    )
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return  # unwritable home (sandbox): run uncached
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took meaningful compile time; the default
    # threshold skips small programs, which through a remote-compile
    # tunnel still cost seconds each. Only touched when still at jax's
    # defaults — a user who tuned these keeps their values.
    if jax.config.jax_persistent_cache_min_compile_time_secs == 1.0:
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.5
        )
