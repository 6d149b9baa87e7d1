#!/usr/bin/env python
"""Does clamping inactive lanes' gather indices to one row make the
gather cheaper?

Every round of the amortized hub walker issues full-batch gathers whose
results only a fraction of lanes use (alias: cur-hub lanes ~37%, bucket:
prev-hub ~37%, nxt rows: advanced lanes ~66%). The gather API offers no
masking — but if the TPU's gather coalesces repeated indices (or the
descriptor stream compresses), pointing all inactive lanes at row 0
would cut the effective descriptor count to the active fraction.

Slope-timed (two in-jit rep counts) like micro_gather.py.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def slope(fn, *args, lo=8, hi=32):
    import jax

    fn_j = jax.jit(fn, static_argnums=0)
    jax.block_until_ready(fn_j(hi, *args))
    times = {}
    for k in (lo, hi):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn_j(k, *args))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return (times[hi] - times[lo]) / (hi - lo)


def main():
    import jax
    import jax.numpy as jnp

    b = 131_072
    key = jax.random.PRNGKey(0)

    for rows, width, label in [
        (612_000, 64, "64-lane super-rows (alias-table shape)"),
        (1_000_000, 256, "256-lane fused rows"),
    ]:
        table = jnp.asarray(
            np.random.default_rng(0)
            .standard_normal((rows, width))
            .astype(np.float32)
        )

        def run(kk, tbl, frac_active):
            def body(i, c):
                k = jax.random.fold_in(key, i)
                k1, k2 = jax.random.split(k)
                idx = jax.random.randint(k1, (b,), 0, tbl.shape[0])
                active = jax.random.uniform(k2, (b,)) < frac_active
                idx = jnp.where(active, idx, 0)
                r = tbl[idx]
                return c + r[:, 0].astype(jnp.int32)

            return jax.lax.fori_loop(0, kk, body, jnp.zeros(b, jnp.int32))

        print(label, flush=True)
        for frac in (1.0, 0.63, 0.37, 0.1, 0.0):
            ms = slope(run, table, frac) * 1e3
            print(f"  active={frac:4.2f}: {ms:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
