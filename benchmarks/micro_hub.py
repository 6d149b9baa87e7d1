#!/usr/bin/env python
"""Microbenchmark the pieces of the hub/rejection walk path on TPU.

Times, at bench-like sizes (131k walkers, 1M-node power-law graph):
  - control: fused-row gather [B] from [N, W]
  - alias proposal gathers ([B, T] super-row fetch + select)
  - bucket membership fetch
  - one full _trial_block
  - full second_order_sample (incl. compaction sweeps)
  - one full hub step_fn vs one fused step_fn

Run: python benchmarks/micro_hub.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench_powerlaw import build_powerlaw_graph  # noqa: E402


def timeit(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    np.asarray(jax.tree.leaves(out)[0])  # force fetch (tunnel)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from pecanpy_tpu.ops import rejection, sampling, transition
    from pecanpy_tpu.ops.layout import build_device_csr

    n = 1_000_000
    b = 131_072
    indptr, indices, data = build_powerlaw_graph(n, exponent=2.2)
    g = build_device_csr(indptr, indices, data, degree_cap=128)
    deg = np.diff(indptr)
    hub_nodes = np.nonzero(deg > 128)[0]
    rng = np.random.default_rng(0)
    # all-hub batch: every lane exercises the hub path
    cur_h = jnp.asarray(
        rng.choice(hub_nodes, size=b).astype(np.int32)
    )
    # random batch (the bench's real mix)
    ends = rng.integers(0, int(indptr[-1]), b)
    cur_m = jnp.asarray(indices[ends].astype(np.int32))
    prev_m = jnp.asarray(
        np.searchsorted(indptr, ends, side="right").astype(np.int32) - 1
    )
    key = jax.random.PRNGKey(0)

    print(f"edge_pack {g.edge_pack.shape}, hbuckets {g.hbuckets.shape}",
          file=sys.stderr)

    @jax.jit
    def control_gather(g, idx, k):
        return jnp.sum(g.gather_rows(idx), axis=-1)

    t = timeit(control_gather, g, cur_m, key)
    print(f"fused row gather [B] ({g.fused.shape[1]} lanes): "
          f"{b / t / 1e6:.1f}M rows/s ({t * 1e3:.1f} ms)")

    for trials in (1, 4):
        @jax.jit
        def alias_prop(g, idx, k, trials=trials):
            rows = g.gather_rows(idx)
            x, w = rejection.alias_propose(g, k, rows, (b, trials))
            return x.sum() + w.sum()

        t = timeit(alias_prop, g, cur_h, key)
        print(f"alias_propose T={trials} (hub batch): "
              f"{b * trials / t / 1e6:.1f}M proposals/s ({t * 1e3:.1f} ms)")

    @jax.jit
    def member(g, x, idx):
        rows = g.gather_rows(idx)
        f, w = rejection.membership(g, x, rows)
        return f.sum() + w.sum()

    t = timeit(member, g, cur_m, cur_h)
    print(f"membership [B] (hub prev): {b / t / 1e6:.1f}M probes/s "
          f"({t * 1e3:.1f} ms)")

    @jax.jit
    def full_sample(g, cur, prev, k):
        cr = g.gather_rows(cur)
        pr = g.gather_rows(prev)
        active = g.rows_is_hub(cr) | g.rows_is_hub(pr)
        return rejection.second_order_sample(
            g, k, cur, prev, cr, pr, 0.5, 2.0, False, active
        )

    t = timeit(full_sample, g, cur_m, prev_m, key)
    print(f"second_order_sample (bench mix): {b / t / 1e6:.2f}M lanes/s "
          f"({t * 1e3:.1f} ms)")
    t = timeit(full_sample, g, cur_h, cur_m, key)
    print(f"second_order_sample (all-hub cur): {b / t / 1e6:.2f}M lanes/s "
          f"({t * 1e3:.1f} ms)")

    @jax.jit
    def fused_step(g, cur, prev, k):
        cr = g.gather_rows(cur)
        pr = g.gather_rows(prev)
        w = transition.node2vec_weights_rows(g, cr, pr, prev, 0.5, 2.0)
        c = sampling.categorical_rows(k, w)
        return sampling.pick_int_columns(g.rows_nbr(cr), c)

    t = timeit(fused_step, g, cur_m, prev_m, key)
    print(f"fused step_fn: {b / t / 1e6:.2f}M lanes/s ({t * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()
