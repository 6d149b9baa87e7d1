#!/usr/bin/env python
"""Round-count + component costs of the queued walker vs the per-batch
amortized engine, on the bench_powerlaw graph.

Run from repo root: python benchmarks/diag_queued.py [n_nodes]
Env: DIAG_LANES (32768), DIAG_WALKS (262144), DIAG_L (80)
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from benchmarks.bench_powerlaw import build_powerlaw_graph  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from pecanpy_tpu.models import engine
    from pecanpy_tpu.ops.layout import build_device_csr

    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    n = int(pos[0]) if pos else 1_000_000
    p, q = 0.5, 2.0
    b = int(os.environ.get("DIAG_LANES", 32_768))
    w = int(os.environ.get("DIAG_WALKS", 262_144))
    L = int(os.environ.get("DIAG_L", 80))

    print(f"building {n}-node power-law graph...", file=sys.stderr)
    indptr, indices, data = build_powerlaw_graph(n)
    graph = build_device_csr(
        indptr, indices, data, degree_cap=128, with_cdf=True
    )
    rng = np.random.default_rng(0)
    starts = jnp.asarray(rng.integers(0, n, w, dtype=np.int32))
    key = jax.random.PRNGKey(0)

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def run_q(g, st, lanes, flush_every, k):
        return engine.generate_walks_queued(
            g, st, k, L, p, q, False, lanes=lanes,
            return_rounds=True, flush_every=flush_every,
        )

    @jax.jit
    def run_a(g, st, k):
        return engine.generate_walks_amortized(
            g, st, k, L, p, q, False, return_rounds=True,
        )

    def timed(label, fn, steps):
        out = fn(key)
        np.asarray(out[1])
        best, rounds = float("inf"), 0
        for i in range(3):
            t0 = time.perf_counter()
            r = fn(jax.random.fold_in(key, i))
            np.asarray(r[1])
            best = min(best, time.perf_counter() - t0)
            rounds = int(r[2])
        print(
            f"{label}: {best:.3f}s, rounds={rounds}, "
            f"{best / max(rounds, 1) * 1e3:.2f} ms/round, "
            f"{steps / best / 1e6:.2f}M steps/s",
            flush=True,
        )

    for fe in (2, 4, 8):
        timed(
            f"queued W={w} B={b} flush_every={fe}",
            lambda k, fe=fe: run_q(graph, starts, b, fe, k), w * L,
        )

    # per-batch reference at the same workload (8 sequential dispatches)
    def run_batches(k):
        outs = []
        for i in range(w // b):
            outs.append(
                run_a(graph, starts[i * b : (i + 1) * b],
                      jax.random.fold_in(k, i))
            )
        return (None, jnp.concatenate([o[1] for o in outs]),
                sum(int(o[2]) for o in outs))

    timed(f"amortized 8x B={b}    ", run_batches, w * L)


if __name__ == "__main__":
    main()
