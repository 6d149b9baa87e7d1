#!/usr/bin/env python
"""Descriptor-rate curve: serialized dependent gathers, no RNG in the loop.

Next indices derive from the gathered values themselves (true dependency,
nothing hoistable), avoiding jax.random costs inside the loop. Also
measures jax.random.randint/uniform alone at the walker batch size.

TIMING: the tunneled device adds a ~50-75 ms dispatch floor per fetch, so
per-op cost is extracted as the SLOPE between two in-jit repetition
counts — (T(K2) - T(K1)) / (K2 - K1) — which cancels the floor exactly.
(Round-2 lesson: dividing one K=8-16 loop by K read the floor as a fake
per-op "fixed cost" of 3-9 ms.)

Run from repo root: python benchmarks/micro_rate.py
"""
import time

import numpy as np

K1, K2 = 32, 160
E = 4_000_000


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def bench(make_fn, *args):
        ts = {}
        for k in (K1, K2):
            fn = make_fn(k)
            out = fn(*args)
            np.asarray(out).ravel()[:1]
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(*args)
                np.asarray(out).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            ts[k] = best
        return (ts[K2] - ts[K1]) / (K2 - K1)

    for w in (8, 64):
        table = jnp.asarray(
            np.abs(rng.standard_normal((E, w))).astype(np.float32)
        )
        for r in (32_768, 131_072, 524_288):
            idx0 = jnp.asarray(rng.integers(0, E, r, dtype=np.int32))

            def make_run(k):
                @jax.jit
                def run(table, idx0, r=r):
                    def body(i, carry):
                        idx, acc = carry
                        rows = table[idx]
                        s = jnp.sum(rows, axis=-1)
                        idx = (idx + s.astype(jnp.int32) + i) % E
                        return idx, acc + s
                    _, acc = jax.lax.fori_loop(
                        0, k, body, (idx0, jnp.zeros(r, jnp.float32))
                    )
                    return acc
                return run

            t = bench(make_run, table, idx0)
            print(
                f"dependent gather [E, {w:2d}] R={r:7d}: "
                f"{t * 1e3:6.2f} ms/op ({r / t / 1e6:6.1f}M rows/s)",
                flush=True,
            )

    # RNG costs at the walker batch size
    b = 131_072
    key = jax.random.PRNGKey(0)

    def make_rand(kk):
        @jax.jit
        def rand_only(key):
            def body(i, carry):
                acc = carry
                k = jax.random.fold_in(key, i)
                v = jax.random.randint(k, (b,), 0, E)
                return acc + v
            return jax.lax.fori_loop(0, kk, body, jnp.zeros(b, jnp.int32))
        return rand_only

    t = bench(make_rand, key)
    print(f"fold_in+randint [{b}]:          {t * 1e3:6.2f} ms/op", flush=True)

    def make_unif(kk):
        @jax.jit
        def unif_only(key):
            def body(i, carry):
                acc = carry
                k = jax.random.fold_in(key, i)
                v = jax.random.uniform(k, (b,))
                return acc + v
            return jax.lax.fori_loop(0, kk, body, jnp.zeros(b, jnp.float32))
        return unif_only

    t = bench(make_unif, key)
    print(f"fold_in+uniform [{b}]:          {t * 1e3:6.2f} ms/op", flush=True)

    # scatter costs (sweep write-back machinery)
    for s in (16_384, 131_072):
        vals = jnp.asarray(rng.integers(0, E, s, dtype=np.int32))

        def make_scat(kk):
            @jax.jit
            def scat(idx0, vals, s=s):
                out = jnp.zeros(131_072, jnp.int32)

                def body(i, carry):
                    out, acc = carry
                    tgt = (vals + i) % 131_072
                    out = out.at[tgt[:s]].set(vals[:s])
                    return out, acc + out[0]
                _, acc = jax.lax.fori_loop(0, kk, body, (out, jnp.int32(0)))
                return acc
            return scat

        t = bench(make_scat, vals[: max(s, 1)], vals)
        print(
            f"scatter-set {s:6d} -> [131072]:  {t * 1e3:6.2f} ms/op",
            flush=True,
        )


if __name__ == "__main__":
    main()
