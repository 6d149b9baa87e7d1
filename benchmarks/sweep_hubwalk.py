#!/usr/bin/env python
"""Interleaved A/B sweep of the amortized hub walker knobs.

Cross-process runs of bench_powerlaw vary ~8-10% through the tunnel;
this sweep compiles every (batch, unroll, trials) variant in ONE
process and interleaves the timed repetitions round-robin, so variants
see the same drift. Reports best and median of R reps each.

Run: python benchmarks/sweep_hubwalk.py
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from benchmarks.bench_powerlaw import build_powerlaw_graph  # noqa: E402


def main():
    import jax

    from pecanpy_tpu.models import engine
    from pecanpy_tpu.ops.layout import build_device_csr

    n = 1_000_000
    p, q = 0.5, 2.0
    walk_length = 80
    reps = 5

    print(f"building {n}-node power-law graph...", file=sys.stderr)
    indptr, indices, data = build_powerlaw_graph(n)
    graph = build_device_csr(
        indptr, indices, data, degree_cap=128, with_cdf=True
    )

    @functools.partial(jax.jit, static_argnums=(2, 3, 4))
    def run(g, st, b, trials, unroll, k):
        return engine.generate_walks_amortized(
            g, st, k, walk_length, p, q, False,
            trials=trials, unroll=unroll,
        )

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    import os

    grid = os.environ.get("SWEEP_GRID", "")
    variants = []
    if grid:  # "b,trials,unroll;b,trials,unroll;..."
        for part in grid.split(";"):
            b, t, u = (int(x) for x in part.split(","))
            variants.append((b, t, u))
    else:
        for b in (32_768, 65_536):
            for unroll in (1, 2, 4):
                for trials in (2,):
                    variants.append((b, trials, unroll))
    starts = {
        b: jax.numpy.asarray(rng.integers(0, n, b, dtype=np.int32))
        for b in {v[0] for v in variants}
    }

    for b, trials, unroll in variants:  # compile pass
        # NB: time by FETCHING (np.asarray) — block_until_ready does not
        # synchronize through this environment's tunnel backend
        np.asarray(run(graph, starts[b], b, trials, unroll, key)[1])
        print(f"compiled b={b} T={trials} u={unroll}", file=sys.stderr)

    times = {v: [] for v in variants}
    for r in range(reps):
        for v in variants:
            b, trials, unroll = v
            k = jax.random.fold_in(key, r * 31 + hash(v) % 1000)
            t0 = time.perf_counter()
            np.asarray(run(graph, starts[b], b, trials, unroll, k)[1])
            times[v].append(time.perf_counter() - t0)

    for v in variants:
        b, trials, unroll = v
        ts = sorted(times[v])
        best, med = ts[0], ts[len(ts) // 2]
        print(
            f"b={b:6d} T={trials} unroll={unroll}: "
            f"best {b * walk_length / best / 1e6:6.2f}M steps/s, "
            f"median {b * walk_length / med / 1e6:6.2f}M steps/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
