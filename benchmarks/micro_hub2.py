#!/usr/bin/env python
"""Cost breakdown of one hub walk step on the power-law bench graph.

In-jit K-repetition timing of: the fused kernel alone, rejection round-0
alone (sweeps disabled), and the full sampler, at the current knobs.

Run: python benchmarks/micro_hub2.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench_powerlaw import build_powerlaw_graph  # noqa: E402

K = 8


def main():
    import jax
    import jax.numpy as jnp

    from pecanpy_tpu.ops import rejection, sampling, transition
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

    def measure(label, build_body):
        @jax.jit
        def run(g, cur, prev, key):
            def body(i, carry):
                cur, prev, acc = carry
                out = build_body(g, cur, prev, jax.random.fold_in(key, i))
                return cur, prev, acc + out
            _, _, acc = jax.lax.fori_loop(
                0, K, body, (cur, prev, jnp.zeros_like(cur))
            )
            return acc

        np.asarray(run(g, cur, prev, key))
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(run(g, cur, prev, jax.random.fold_in(key, 7 + i)))
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best / K * 1e3:6.1f} ms/step", flush=True)

    def fused_only(g, cur, prev, k):
        cr = g.gather_rows(cur)
        pr = g.gather_rows(prev)
        w = transition.node2vec_weights_rows(g, cr, pr, prev, 0.5, 2.0)
        c = sampling.categorical_rows(k, w)
        return sampling.pick_int_columns(g.rows_nbr(cr), c)

    measure("fused kernel + 2 row gathers  ", fused_only)

    def round0_only(g, cur, prev, k):
        cr = g.gather_rows(cur)
        pr = g.gather_rows(prev)
        active = g.rows_is_hub(cr) | g.rows_is_hub(pr)
        return rejection.second_order_sample(
            g, k, cur, prev, cr, pr, 0.5, 2.0, False, active
        )

    saved = rejection.SWEEP_CAP
    rejection.SWEEP_CAP = 0  # timing only: round 0, no sweeps
    measure("round-0 only (sweeps off)     ", round0_only)
    rejection.SWEEP_CAP = saved
    measure("full sampler (current knobs)  ", round0_only)


if __name__ == "__main__":
    main()
