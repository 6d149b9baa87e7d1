#!/usr/bin/env python
"""Break down the Pallas applier's cost: argsort vs payload permute vs
the tile-streaming kernel, at the token-stream size of one chunk-step.

Per-op cost is the SLOPE between two in-jit repetition counts, which
cancels the tunneled device's ~50-75 ms dispatch floor.

Run from repo root: python benchmarks/micro_apply.py [n_rows]
"""
import sys

sys.path.insert(0, ".")
import time

import numpy as np

K1, K2 = 8, 32


def bench(make_fn, *args):
    import jax

    ts = {}
    for k in (K1, K2):
        fn = make_fn(k)
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[K2] - ts[K1]) / (K2 - K1)


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

    def make_sort(k):
        @jax.jit
        def sort_only(ids):
            def body(i, carry):
                ids, acc = carry
                order = jnp.argsort(ids + i)
                return ids, acc + order[0]
            return jax.lax.fori_loop(0, k, body, (ids, jnp.int32(0)))[1]
        return sort_only

    print(f"argsort [R={r}] int32:        {bench(make_sort, ids)*1e3:6.1f} ms",
          flush=True)

    order = jnp.argsort(ids)

    def make_permute(k):
        @jax.jit
        def permute_only(upd, order):
            def body(i, carry):
                upd, acc = carry
                s = upd[(order + i) % r]
                return upd, acc + s[0, 0]
            return jax.lax.fori_loop(0, k, body, (upd, jnp.float32(0)))[1]
        return permute_only

    print(f"payload permute [R, 128]:     {bench(make_permute, upd, order)*1e3:6.1f} ms",
          flush=True)

    def make_full(k):
        @jax.jit
        def full(table, ids, upd, cnt):
            def body(i, table):
                return apply_lib.apply_mean_updates(
                    table, ids, upd, cnt, jnp.float32(1e-4), use_pallas=True
                )
            return jax.lax.fori_loop(0, k, body, table)
        return full

    print(f"full apply_mean_updates:      {bench(make_full, table, ids, upd, cnt)*1e3:6.1f} ms",
          flush=True)

    # pre-sorted kernel-only: sort outside, measure scales + pallas_call
    ids_s = ids[order]
    upd_s = upd[order]
    cnt_s = cnt

    def make_presorted(k):
        @jax.jit
        def presorted(table, ids_s, upd_s, cnt_s):
            def body(i, table):
                scale = apply_lib._sorted_scales(
                    ids_s, cnt_s, jnp.float32(1e-4), 4.0
                )
                return apply_lib._finalize_and_run(
                    table, ids_s, upd_s * scale[:, None], jnp.int32(0)
                )
            return jax.lax.fori_loop(0, k, body, table)
        return presorted

    print(f"prep+kernel on sorted input:  {bench(make_presorted, table, ids_s, upd_s, cnt_s)*1e3:6.1f} ms",
          flush=True)

    # merged two-stream pass (the SGNS w_out shape: token stream + a
    # 32k negative pool stream) vs two sequential one-stream passes
    r_b = 32768
    ids_b = jnp.asarray(rng.integers(0, n, r_b, dtype=np.int32))
    upd_b = jnp.asarray(rng.standard_normal((r_b, 128)).astype(np.float32))
    cnt_b = jnp.ones(r_b, jnp.float32)

    def make_merged(k):
        @jax.jit
        def merged(table, ids, upd, cnt, ids_b, upd_b, cnt_b):
            def body(i, table):
                return apply_lib.apply_mean_updates_two(
                    table, ids, upd, cnt, ids_b, upd_b, cnt_b,
                    jnp.float32(1e-4), use_pallas=True,
                )
            return jax.lax.fori_loop(0, k, body, table)
        return merged

    print(f"merged two-stream pass:       {bench(make_merged, table, ids, upd, cnt, ids_b, upd_b, cnt_b)*1e3:6.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
