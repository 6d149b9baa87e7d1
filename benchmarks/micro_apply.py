#!/usr/bin/env python
"""Break down the Pallas applier's cost: argsort vs payload permute vs
the tile-streaming kernel, at the negative-stream size of one chunk-step.

Run: python benchmarks/micro_apply.py [n_rows]
"""
import sys
import time

import numpy as np

K = 8


def bench(fn, *args):
    import jax

    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best / K


def main():
    import jax
    import jax.numpy as jnp

    from pecanpy_tpu.ops import apply as apply_lib

    n = 1_000_000
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, n, r, dtype=np.int32))
    upd = jnp.asarray(rng.standard_normal((r, 128)).astype(np.float32))
    cnt = jnp.ones(r, jnp.float32)
    table = jnp.zeros((n, 128), jnp.float32)

    @jax.jit
    def sort_only(ids):
        def body(i, carry):
            ids, acc = carry
            order = jnp.argsort(ids)
            return ids, acc + order[0]
        return jax.lax.fori_loop(0, K, body, (ids, jnp.int32(0)))[1]

    print(f"argsort [R={r}] int32:        {bench(sort_only, ids)*1e3:6.1f} ms",
          flush=True)

    order = jnp.argsort(ids)

    @jax.jit
    def permute_only(upd, order):
        def body(i, carry):
            upd, acc = carry
            s = upd[order]
            return upd, acc + s[0, 0]
        return jax.lax.fori_loop(0, K, body, (upd, jnp.float32(0)))[1]

    print(f"payload permute [R, 128]:     {bench(permute_only, upd, order)*1e3:6.1f} ms",
          flush=True)

    @jax.jit
    def full(table, ids, upd, cnt):
        def body(i, table):
            return apply_lib.apply_mean_updates(
                table, ids, upd, cnt, jnp.float32(1e-4), use_pallas=True
            )
        return jax.lax.fori_loop(0, K, body, table)

    print(f"full apply_mean_updates:      {bench(full, table, ids, upd, cnt)*1e3:6.1f} ms",
          flush=True)

    # pre-sorted kernel-only: sort outside, measure the pallas_call path
    ids_s = ids[order]
    upd_s = upd[order]
    cnt_s = cnt

    @jax.jit
    def presorted(table, ids_s, upd_s, cnt_s):
        def body(i, table):
            # ids already sorted: argsort of sorted ids is cheap? no —
            # measure the pipeline minus data movement by reusing the
            # sorted arrays directly through the private kernel wrapper
            (i2, u2, c2), bounds = apply_lib._prep_stream(
                ids_s, upd_s, cnt_s, table.shape[0], 0
            )
            return apply_lib._apply_pallas(
                table, i2, u2, c2, bounds,
                jnp.asarray([1e-4, 4.0], jnp.float32),
                jnp.zeros(1, jnp.int32),
            )
        return jax.lax.fori_loop(0, K, body, table)

    print(f"prep+kernel on sorted input:  {bench(presorted, table, ids_s, upd_s, cnt_s)*1e3:6.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
