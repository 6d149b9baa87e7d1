#!/usr/bin/env python
"""Measure TPU gather throughput per row width + sub-row select variants.

Every measurement loops K times inside one jit (serialized by feeding the
previous result into the next index computation) so the tunneled ~50 ms
dispatch floor amortizes away.

Run: python benchmarks/micro_gather.py
"""
import time

import numpy as np

K = 16
R = 524_288  # gathered rows per repetition (~4 trial-gathers of 131k)
E = 4_000_000  # table rows (hub-table scale)


def bench(fn, *args):
    import jax

    out = fn(*args)
    np.asarray(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return R * K / (best / 1.0)


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, E, R, dtype=np.int32))

    for w in (8, 64):
        table = jnp.asarray(
            rng.standard_normal((E, w)).astype(np.float32)
        )

        @jax.jit
        def run(table, idx0, w=w):
            def body(i, carry):
                idx, acc = carry
                rows = table[idx]  # [R, w]
                s = jnp.sum(rows, axis=-1)
                idx = (idx + s.astype(jnp.int32) + i) % E
                return idx, acc + s
            _, acc = jax.lax.fori_loop(
                0, K, body, (idx0, jnp.zeros(R, jnp.float32))
            )
            return acc

        rate = bench(run, table, idx0)
        print(f"gather [E, {w:3d}]: {rate / 1e6:6.1f}M rows/s", flush=True)

    # super-row variants: fetch 8-lane logical row out of [E/8, 64]
    table64 = jnp.asarray(
        rng.standard_normal((E // 8, 64)).astype(np.float32)
    )

    @jax.jit
    def super_reshape(table, idx0):
        def body(i, carry):
            idx, acc = carry
            rows = table[idx >> 3]  # [R, 64]
            sub = idx & 7
            r = rows.reshape(R, 8, 8)
            mask = jnp.arange(8, dtype=jnp.int32) == sub[:, None]
            r8 = jnp.sum(jnp.where(mask[..., None], r, 0.0), axis=-2)
            s = jnp.sum(r8, axis=-1)
            idx = (idx + s.astype(jnp.int32) + i) % E
            return idx, acc + s
        _, acc = jax.lax.fori_loop(
            0, K, body, (idx0, jnp.zeros(R, jnp.float32))
        )
        return acc

    rate = bench(super_reshape, table64, idx0)
    print(f"super-row + (8,8) reshape-select: {rate / 1e6:6.1f}M rows/s",
          flush=True)

    @jax.jit
    def super_lanemask(table, idx0):
        lanes = jnp.arange(64, dtype=jnp.int32)

        def body(i, carry):
            idx, acc = carry
            rows = table[idx >> 3]  # [R, 64]
            sub = idx & 7
            mask = (lanes >> 3) == sub[:, None]  # this sub-row's 8 lanes
            s = jnp.sum(jnp.where(mask, rows, 0.0), axis=-1)
            idx = (idx + s.astype(jnp.int32) + i) % E
            return idx, acc + s
        _, acc = jax.lax.fori_loop(
            0, K, body, (idx0, jnp.zeros(R, jnp.float32))
        )
        return acc

    rate = bench(super_lanemask, table64, idx0)
    print(f"super-row + 64-lane mask-reduce:  {rate / 1e6:6.1f}M rows/s",
          flush=True)


if __name__ == "__main__":
    main()
