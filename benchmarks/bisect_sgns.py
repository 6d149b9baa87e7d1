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


def sort_micro():
    """Price the apply-block argsorts directly (slope-timed).

    Bitonic sort cost is data-independent, so timing standalone
    argsorts at the apply streams' exact sizes (the [BT] W_in stream
    and the [BT + M] merged W_out composite) gives the sorts' in-step
    cost without perturbing the pipeline. (An earlier in-place ablation
    that swapped argsort for iota also fed UNSORTED ids to the visit
    planner, corrupting the tile bounds and the kernel's work — the
    number it produced mismeasured the non-sort side.)
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    for label, r in (("w_in stream", 100_096), ("w_out merged", 132_864)):
        ids = jnp.asarray(rng.integers(0, 2 * N, r, dtype=np.int32))

        def chain(x, k):
            for i in range(k):
                x = jnp.argsort(x + i)  # +i defeats CSE between links
            return x

        lo = jax.jit(lambda x: chain(x, 2))
        hi = jax.jit(lambda x: chain(x, 10))
        np.asarray(lo(ids)[:1]), np.asarray(hi(ids)[:1])
        t = {}
        for name, fn in (("lo", lo), ("hi", hi)):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn(ids)[:1])
                best = min(best, time.perf_counter() - t0)
            t[name] = best
        per = (t["hi"] - t["lo"]) / 8
        print(f"argsort [{r}] ({label}): {per * 1e3:.2f} ms", flush=True)


def run_config(label, config_kwargs, disable_applies=False):
    import jax
    import jax.numpy as jnp

    from pecanpy_tpu.models import sgns
    from pecanpy_tpu.ops import apply as apply_lib

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
    key = jax.random.PRNGKey(0)
    # allocate exactly as production does: TILE-aligned rows + the
    # shipping table dtype (override with BENCH_TABLE_DTYPE=float32)
    import os as _os

    dtype = jnp.dtype(_os.environ.get("BENCH_TABLE_DTYPE", "bfloat16"))
    w_in, w_out = sgns._alloc_tables(key, N, config.dim, dtype)

    saved = (apply_lib.apply_mean_updates, apply_lib.apply_mean_updates_two)
    if disable_applies:
        # keep a data dependency on upd but preserve the table dtype
        # (bf16 tables: a plain f32-scalar add would promote the carry)
        apply_lib.apply_mean_updates = (
            lambda table, ids, upd, cnt, lr, **kw: table
            + (1e-30 * upd[0, 0]).astype(table.dtype)
        )
        apply_lib.apply_mean_updates_two = (
            lambda table, ids_a, upd_a, cnt_a, ids_b, upd_b, cnt_b, lr,
            **kw: table
            + (1e-30 * (upd_a[0, 0] + upd_b[0, 0])).astype(table.dtype)
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
        if disable_applies:
            import importlib

            from pecanpy_tpu.models import sgns as s2

            importlib.reload(s2)


def main():
    from pecanpy_tpu.utils.retry import warmup_backend

    warmup_backend()  # tunneled-TPU first contact can fail transiently
    import os

    only = os.environ.get("BISECT_ONLY", "")
    cases = [
        ("full (defaults)         ", {}, False),
        ("applies disabled        ", {}, True),
        ("negative=1              ", {"negative": 1}, False),
        ("neg_pool off            ", {"neg_pool": 0}, False),
        ("sample off (no subsort) ", {"sample": 0.0}, False),
        ("window=3                ", {"window": 3}, False),
        ("window=3, no applies    ", {"window": 3}, True),
    ]
    for label, kwargs, disable in cases:
        if only and only not in label:
            continue
        run_config(label, kwargs, disable_applies=disable)
    if not only or "argsort" in only:
        sort_micro()


if __name__ == "__main__":
    main()
