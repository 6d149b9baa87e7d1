"""The sparse-row update applier (``ops/apply.py``).

The scatter reference path runs everywhere (CPU in this suite); the
Pallas tile-streaming path only compiles on TPU and is exercised by the
benchmark drivers — here we pin the *semantics* both paths share.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from pecanpy_tpu.ops.apply import (
    apply_mean_updates,
    apply_mean_updates_two,
)


def reference(table, ids, upd, cnt, lr, cap):
    sums = np.zeros_like(table)
    cnts = np.zeros(table.shape[0])
    for i, u, c in zip(ids, upd, cnt):
        sums[i] += u
        cnts[i] += c
    scale = np.minimum(cnts, cap) / np.maximum(cnts, 1e-9)
    return table - lr * sums * scale[:, None]


@pytest.mark.parametrize("cap", [1.0, 4.0])
def test_matches_reference(rng, cap):
    n, d, r = 50, 16, 200
    table = rng.normal(size=(n, d)).astype(np.float32)
    ids = rng.integers(0, n, r).astype(np.int32)
    upd = rng.normal(size=(r, d)).astype(np.float32)
    cnt = rng.integers(0, 3, r).astype(np.float32)
    got = apply_mean_updates(
        jnp.asarray(table), jnp.asarray(ids), jnp.asarray(upd),
        jnp.asarray(cnt), jnp.float32(0.05), cap=cap,
    )
    expected = reference(table, ids, upd, cnt, 0.05, cap)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-5, atol=1e-6)


def test_two_streams_equal_sequential(rng):
    """Merged two-stream application == applying the streams one by one
    (linearity of the pre-scaled form; groups keep separate caps)."""
    n, d = 40, 8
    table = rng.normal(size=(n, d)).astype(np.float32)
    r_a, r_b = 90, 30
    ids_a = rng.integers(0, n, r_a).astype(np.int32)
    upd_a = rng.normal(size=(r_a, d)).astype(np.float32)
    cnt_a = rng.integers(0, 3, r_a).astype(np.float32)
    ids_b = rng.integers(0, n, r_b).astype(np.int32)
    upd_b = rng.normal(size=(r_b, d)).astype(np.float32)
    cnt_b = rng.integers(0, 3, r_b).astype(np.float32)
    lr = jnp.float32(0.05)
    got = apply_mean_updates_two(
        jnp.asarray(table), jnp.asarray(ids_a), jnp.asarray(upd_a),
        jnp.asarray(cnt_a), jnp.asarray(ids_b), jnp.asarray(upd_b),
        jnp.asarray(cnt_b), lr, cap_a=4.0, cap_b=1.0,
    )
    step1 = apply_mean_updates(
        jnp.asarray(table), jnp.asarray(ids_a), jnp.asarray(upd_a),
        jnp.asarray(cnt_a), lr, cap=4.0,
    )
    expected = apply_mean_updates(
        step1, jnp.asarray(ids_b), jnp.asarray(upd_b),
        jnp.asarray(cnt_b), lr, cap=1.0,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-5, atol=1e-6
    )


def test_untouched_rows_unchanged(rng):
    n, d = 32, 8
    table = rng.normal(size=(n, d)).astype(np.float32)
    ids = jnp.asarray([3, 3, 7], dtype=jnp.int32)
    upd = jnp.asarray(rng.normal(size=(3, d)).astype(np.float32))
    cnt = jnp.ones(3)
    got = np.asarray(
        apply_mean_updates(jnp.asarray(table), ids, upd, cnt, jnp.float32(0.1))
    )
    mask = np.ones(n, bool)
    mask[[3, 7]] = False
    np.testing.assert_array_equal(got[mask], table[mask])
    assert not np.allclose(got[3], table[3])


def test_zero_count_padding_is_noop(rng):
    n, d = 16, 8
    table = rng.normal(size=(n, d)).astype(np.float32)
    ids = jnp.asarray([5, 9], dtype=jnp.int32)
    upd = jnp.zeros((2, d))
    cnt = jnp.zeros(2)
    got = np.asarray(
        apply_mean_updates(jnp.asarray(table), ids, upd, cnt, jnp.float32(0.1))
    )
    np.testing.assert_array_equal(got, table)
