#!/usr/bin/env python
"""Bisect the SGNS chunk-step cost: full vs applies-disabled vs lighter
negative/window settings, on the bench_sgns workload shape.

Run from repo root: python benchmarks/bisect_sgns.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N = 1_000_000
WALKS = 32_768
T_COLS = 81


def run_config(label, config_kwargs, disable_applies=False,
               fake_sort=False):
    import jax
    import jax.numpy as jnp

    from pecanpy_tpu.models import sgns
    from pecanpy_tpu.ops import apply as apply_lib

    if fake_sort:
        # TIMING-ONLY ablation: replace the update-stream argsorts with
        # iota (destroys correctness, preserves every downstream shape)
        # to price the sort itself inside the apply block. The jitted
        # appliers cache executables, so drop them before and after.
        class _FakeSortJnp:
            def __init__(self, real):
                self._real = real

            def __getattr__(self, name):
                if name == "argsort":
                    return lambda x: self._real.arange(
                        x.shape[0], dtype=self._real.int32
                    )
                return getattr(self._real, name)

        apply_lib.apply_mean_updates.clear_cache()
        apply_lib.apply_mean_updates_two.clear_cache()
        apply_lib.jnp = _FakeSortJnp(jnp)

    rng = np.random.default_rng(0)
    walks = jnp.asarray(rng.integers(0, N, (WALKS, T_COLS), dtype=np.int32))
    eff = jnp.full((WALKS,), T_COLS, dtype=jnp.int32)

    config = sgns.SGNSConfig(seed=0, **config_kwargs)
    chunk = sgns.resolve_batch_walks(config, N, T_COLS)
    counts = sgns._count_tokens(walks, eff, N)
    keep = sgns._keep_probs(counts, config.sample)
    neg_table = jnp.asarray(
        sgns.build_negative_table(np.asarray(counts), seed=0)
    )
    bound = 0.5 / config.dim
    key = jax.random.PRNGKey(0)
    w_in = jax.random.uniform(
        key, (N, config.dim), minval=-bound, maxval=bound
    )
    w_out = jnp.zeros((N, config.dim), dtype=jnp.float32)

    saved = (apply_lib.apply_mean_updates, apply_lib.apply_mean_updates_two)
    if disable_applies:
        apply_lib.apply_mean_updates = (
            lambda table, ids, upd, cnt, lr, **kw: table + 1e-30 * upd[0, 0]
        )
        apply_lib.apply_mean_updates_two = (
            lambda table, ids_a, upd_a, cnt_a, ids_b, upd_b, cnt_b, lr,
            **kw: table + 1e-30 * (upd_a[0, 0] + upd_b[0, 0])
        )
        import importlib

        importlib.reload(sgns)
        config = sgns.SGNSConfig(seed=0, **config_kwargs)

    try:
        n_chunks = WALKS // chunk
        step = sgns._make_span_step(N, config, True, chunk)
        lrs = jnp.full((n_chunks,), 0.02, jnp.float32)

        def dispatch(w_in, w_out, g_hi):
            return step(
                w_in, w_out, walks[: n_chunks * chunk],
                eff[: n_chunks * chunk], keep, neg_table, lrs, key,
                0, g_hi, 0,
            )

        # the span step donates its table args: chain outputs back in so
        # no buffer is ever passed twice (donated-buffer reuse is a hard
        # error on TPU)
        w1, w2 = dispatch(w_in, w_out, n_chunks)
        np.asarray(w1[0, :1])
        times = {}
        for g_hi in (4, n_chunks):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                w1, w2 = dispatch(w1, w2, g_hi)
                np.asarray(w1[0, :1])
                best = min(best, time.perf_counter() - t0)
            times[g_hi] = best
        per = (times[n_chunks] - times[4]) / (n_chunks - 4)
        tokens = chunk * T_COLS
        print(
            f"{label}: {per * 1e3:6.1f} ms/chunk-step "
            f"({tokens / per / 1e6:5.2f}M tokens/s)",
            flush=True,
        )
    finally:
        apply_lib.apply_mean_updates = saved[0]
        apply_lib.apply_mean_updates_two = saved[1]
        if fake_sort:
            import jax.numpy as real_jnp

            apply_lib.jnp = real_jnp
            apply_lib.apply_mean_updates.clear_cache()
            apply_lib.apply_mean_updates_two.clear_cache()
        if disable_applies:
            import importlib

            from pecanpy_tpu.models import sgns as s2

            importlib.reload(s2)


def main():
    import os

    only = os.environ.get("BISECT_ONLY", "")
    cases = [
        ("full (defaults)         ", {}, False, False),
        ("applies disabled        ", {}, True, False),
        ("apply sorts ablated     ", {}, False, True),
        ("negative=1              ", {"negative": 1}, False, False),
        ("neg_pool off            ", {"neg_pool": 0}, False, False),
        ("sample off (no subsort) ", {"sample": 0.0}, False, False),
        ("window=3                ", {"window": 3}, False, False),
        ("window=3, no applies    ", {"window": 3}, True, False),
    ]
    for label, kwargs, disable, fake_sort in cases:
        if only and only not in label:
            continue
        run_config(
            label, kwargs, disable_applies=disable, fake_sort=fake_sort
        )


if __name__ == "__main__":
    main()
