#!/usr/bin/env python
"""TPU correctness check: Pallas applier vs the scatter reference, for
the one-stream and merged two-stream paths (f32 and bf16 tables)."""
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax.numpy as jnp

    from pecanpy_tpu.ops.apply import (
        apply_mean_updates,
        apply_mean_updates_two,
        _apply_scatter,
    )

    rng = np.random.default_rng(0)
    n, d = 3000, 128
    r_a, r_b = 5000, 700
    table = rng.normal(size=(n, d)).astype(np.float32)
    ids_a = rng.integers(0, n, r_a).astype(np.int32)
    upd_a = rng.normal(size=(r_a, d)).astype(np.float32)
    cnt_a = rng.integers(0, 3, r_a).astype(np.float32)
    ids_b = rng.integers(0, n, r_b).astype(np.int32)
    upd_b = rng.normal(size=(r_b, d)).astype(np.float32)
    cnt_b = rng.integers(0, 3, r_b).astype(np.float32)
    lr = jnp.float32(0.05)

    ref = _apply_scatter(
        jnp.asarray(table), jnp.asarray(ids_a), jnp.asarray(upd_a),
        jnp.asarray(cnt_a), lr, 4.0,
    )
    got = apply_mean_updates(
        jnp.asarray(table), jnp.asarray(ids_a), jnp.asarray(upd_a),
        jnp.asarray(cnt_a), lr, use_pallas=True, cap=4.0,
    )
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"one-stream pallas vs scatter: max abs err {err:.3e}")
    assert err < 5e-3, err

    ref2 = _apply_scatter(
        ref, jnp.asarray(ids_b), jnp.asarray(upd_b), jnp.asarray(cnt_b),
        lr, 1.0,
    )
    got2 = apply_mean_updates_two(
        jnp.asarray(table), jnp.asarray(ids_a), jnp.asarray(upd_a),
        jnp.asarray(cnt_a), jnp.asarray(ids_b), jnp.asarray(upd_b),
        jnp.asarray(cnt_b), lr, use_pallas=True, cap_a=4.0, cap_b=1.0,
    )
    err2 = float(jnp.max(jnp.abs(got2 - ref2)))
    print(f"merged two-stream vs scatter: max abs err {err2:.3e}")
    assert err2 < 5e-3, err2

    # bf16 table smoke (stochastic rounding path compiles + stays close)
    t16 = jnp.asarray(table).astype(jnp.bfloat16)
    got16 = apply_mean_updates_two(
        t16, jnp.asarray(ids_a), jnp.asarray(upd_a), jnp.asarray(cnt_a),
        jnp.asarray(ids_b), jnp.asarray(upd_b), jnp.asarray(cnt_b),
        lr, use_pallas=True, cap_a=4.0, cap_b=1.0,
    )
    err16 = float(
        jnp.max(jnp.abs(got16.astype(jnp.float32) - ref2))
    )
    print(f"bf16 merged vs f32 scatter:   max abs err {err16:.3e}")
    assert err16 < 0.05, err16
    print("OK")


if __name__ == "__main__":
    main()
