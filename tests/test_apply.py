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


def _force_v2(monkeypatch):
    from pecanpy_tpu.ops import apply as apply_lib

    monkeypatch.setattr(apply_lib, "APPLY_V2", True)
    monkeypatch.setattr(apply_lib, "DOT_BF16", False)  # f32-exact compare
    return apply_lib


def test_v2_kernel_matches_scatter_interpret(rng, monkeypatch):
    """The windowed per-tile (v2) applier equals the scatter reference,
    run through the Pallas interpreter on CPU (TILE-spanning stream,
    empty tiles, repeated hot ids, window-boundary sharing)."""
    apply_lib = _force_v2(monkeypatch)
    n = apply_lib.TILE * 3  # 3 tiles; leave tile 1 untouched
    d = apply_lib._LANE
    r = 4 * apply_lib.K_WINDOW + 37  # non-multiple: exercises padding
    table = rng.normal(size=(n, d)).astype(np.float32)
    ids = np.concatenate([
        rng.integers(0, apply_lib.TILE, r - 40),           # tile 0
        np.full(20, 2 * apply_lib.TILE + 5),               # hot row, tile 2
        rng.integers(2 * apply_lib.TILE, n, 20),           # tile 2
    ]).astype(np.int32)
    upd = rng.normal(size=(r, d)).astype(np.float32)
    cnt = rng.integers(0, 3, r).astype(np.float32)
    got = np.asarray(
        apply_lib._pallas_apply_one(
            jnp.asarray(table), jnp.asarray(ids), jnp.asarray(upd),
            jnp.asarray(cnt), jnp.float32(0.05), 4.0, jnp.int32(3),
            interpret=True,
        )
    )
    expected = np.asarray(
        apply_lib._apply_scatter(
            jnp.asarray(table), jnp.asarray(ids), jnp.asarray(upd),
            jnp.asarray(cnt), jnp.float32(0.05), 4.0,
        )
    )
    # untouched tile copies through bit-exactly
    t1 = slice(apply_lib.TILE, 2 * apply_lib.TILE)
    np.testing.assert_array_equal(got[t1], table[t1])
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=1e-6)


def test_v2_two_streams_matches_scatter_interpret(rng, monkeypatch):
    apply_lib = _force_v2(monkeypatch)
    n = apply_lib.TILE * 2
    d = apply_lib._LANE
    r_a, r_b = apply_lib.K_WINDOW + 11, 301
    table = rng.normal(size=(n, d)).astype(np.float32)
    ids_a = rng.integers(0, n, r_a).astype(np.int32)
    upd_a = rng.normal(size=(r_a, d)).astype(np.float32)
    cnt_a = rng.integers(1, 3, r_a).astype(np.float32)
    ids_b = rng.integers(0, n, r_b).astype(np.int32)
    upd_b = rng.normal(size=(r_b, d)).astype(np.float32)
    cnt_b = rng.integers(1, 3, r_b).astype(np.float32)
    lr = jnp.float32(0.05)
    got = np.asarray(
        apply_lib._pallas_apply_two(
            jnp.asarray(table), jnp.asarray(ids_a), jnp.asarray(upd_a),
            jnp.asarray(cnt_a), jnp.asarray(ids_b), jnp.asarray(upd_b),
            jnp.asarray(cnt_b), lr, 4.0, 1.0, jnp.int32(0),
            interpret=True,
        )
    )
    step1 = apply_lib._apply_scatter(
        jnp.asarray(table), jnp.asarray(ids_a), jnp.asarray(upd_a),
        jnp.asarray(cnt_a), lr, 4.0,
    )
    expected = np.asarray(apply_lib._apply_scatter(
        step1, jnp.asarray(ids_b), jnp.asarray(upd_b),
        jnp.asarray(cnt_b), lr, 1.0,
    ))
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=1e-6)
