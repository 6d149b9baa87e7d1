#!/usr/bin/env python
"""Sweep the rejection-sampler trial/compaction knobs on the TPU.

Times second_order_sample on a bench-like mixed batch (131k lanes, 1M-node
Chung-Lu graph) with K in-jit repetitions per dispatch so the ~50 ms RPC
floor of the tunneled device does not drown the signal.

Run: python benchmarks/tune_rejection.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench_powerlaw import build_powerlaw_graph  # noqa: E402

K1, K2 = 8, 24  # per-config cost = slope between the two rep counts
# (cancels the ~50-75 ms tunnel dispatch floor exactly)


def main():
    import jax
    import jax.numpy as jnp

    from pecanpy_tpu.ops import rejection
    from pecanpy_tpu.ops.layout import build_device_csr

    n = 1_000_000
    b = 131_072
    indptr, indices, data = build_powerlaw_graph(n, exponent=2.2)
    g = build_device_csr(indptr, indices, data, degree_cap=128)
    rng = np.random.default_rng(0)
    ends = rng.integers(0, int(indptr[-1]), b)
    cur = jnp.asarray(indices[ends].astype(np.int32))
    prev = jnp.asarray(
        (np.searchsorted(indptr, ends, side="right") - 1).astype(np.int32)
    )
    key = jax.random.PRNGKey(0)

    # (FIRST_ROUND_TRIALS, FIRST_FRACTION, SWEEP_TRIALS, COMPACT_FRACTION)
    configs = [
        (2, 4, 4, 16),  # current defaults
        (2, 8, 4, 16),
        (2, 8, 4, 32),
        (2, 4, 4, 32),
        (3, 4, 4, 16),
        (1, 4, 4, 16),
    ]
    for t0, f0, ts, frac in configs:
        rejection.FIRST_ROUND_TRIALS = t0
        rejection.FIRST_FRACTION = f0
        rejection.SWEEP_TRIALS = ts
        rejection.COMPACT_FRACTION = frac

        def make_run(k):
            @jax.jit
            def run(g, cur, prev, key):
                def body(i, carry):
                    cur, prev, acc = carry
                    cr = g.gather_rows(cur)
                    pr = g.gather_rows(prev)
                    active = g.rows_is_hub(cr) | g.rows_is_hub(pr)
                    nxt = rejection.second_order_sample(
                        g, jax.random.fold_in(key, i), cur, prev, cr, pr,
                        0.5, 2.0, False, active,
                    )
                    return cur, prev, acc + nxt  # same batch each rep
                _, _, acc = jax.lax.fori_loop(
                    0, k, body, (cur, prev, jnp.zeros_like(cur))
                )
                return acc
            return run

        times = {}
        for k in (K1, K2):
            run = make_run(k)
            np.asarray(run(g, cur, prev, key))  # compile + warm
            best = float("inf")
            for i in range(3):
                t1 = time.perf_counter()
                np.asarray(run(g, cur, prev, jax.random.fold_in(key, i)))
                best = min(best, time.perf_counter() - t1)
            times[k] = best
        per = (times[K2] - times[K1]) / (K2 - K1)
        print(
            f"T0={t0} F0={f0} Ts={ts} frac={frac}: {per * 1e3:7.1f} ms/step "
            f"({b / per / 1e6:5.2f}M lanes/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
