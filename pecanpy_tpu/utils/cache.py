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

Backend policy: the cache is **TPU-only**. Its motivation is the
remote-compile cost of the tunneled TPU; on CPU the persistent cache
stores XLA:CPU AOT results specialized to the compiling host's CPU
features, and loading one on a different host warns of (and risks) a
SIGILL — observed as wall-to-wall ``cpu_aot_loader`` machine-feature
errors when a round-4 CPU dryrun read a cache written elsewhere. TPU
executables carry no host-CPU feature dependence. Set
``PECANPY_TPU_COMPILE_CACHE=force`` to enable on any backend (same-host
CPU workflows only).
"""
import os

_done = False


def enable_compilation_cache() -> None:
    """Idempotently point JAX's persistent compilation cache at a
    per-user directory (``~/.cache/pecanpy_tpu/xla``). TPU-only (see
    module docstring); initializes the JAX backend to check."""
    global _done
    if _done:
        return
    _done = True
    knob = os.environ.get("PECANPY_TPU_COMPILE_CACHE", "1")
    if knob == "0":
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        return  # user already configured a cache; respect it
    if knob != "force" and jax.default_backend() != "tpu":
        return  # CPU AOT cache entries are host-feature-specific
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
