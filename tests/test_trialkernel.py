"""Fused Pallas trial block vs the XLA path: bitwise parity.

The kernel wrapper replicates ``rejection._single_trial``'s RNG tree and
op order exactly, so with integer edge weights (exact CDF sums) the two
paths must agree BITWISE — proposals, accept bits, and carried weights.
Interpret mode makes these meaningful on the CPU test mesh.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pecanpy_tpu.models import engine
from pecanpy_tpu.ops import rejection, trialkernel
from pecanpy_tpu.ops.layout import device_csr_from_dense


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _int_weight_hub_graph(rng, n=24, cap=4):
    """Symmetric graph with integer weights (exact f32 cumsum) + hubs."""
    adj = (rng.random((n, n)) < 0.35).astype(np.float64)
    adj = np.maximum(adj, adj.T)
    np.fill_diagonal(adj, 0)
    w = rng.integers(1, 4, (n, n)).astype(np.float64)
    adj = adj * (np.triu(w) + np.triu(w, 1).T)
    for i in range(n):
        if adj[i].sum() == 0:
            adj[i, (i + 1) % n] = adj[(i + 1) % n, i] = 1.0
    g = device_csr_from_dense(adj, degree_cap=cap)
    assert g.has_hubs
    return adj, g


def _edge_lanes(rng, adj, g, b):
    n = adj.shape[0]
    cur = rng.integers(0, n, b)
    prev = np.array(
        [
            np.random.default_rng(i).choice(np.nonzero(adj[c])[0])
            for i, c in enumerate(cur)
        ]
    )
    cur = jnp.asarray(cur.astype(np.int32))
    prev = jnp.asarray(prev.astype(np.int32))
    return cur, prev, g.gather_rows(cur), g.gather_rows(prev)


@pytest.mark.parametrize("trials", [1, 2])
@pytest.mark.parametrize("use_atom", [True, False])
def test_trial_block_fused_bitwise(rng, trials, use_atom):
    adj, g = _int_weight_hub_graph(rng)
    cur, prev, cur_rows, prev_rows = _edge_lanes(rng, adj, g, 96)
    p, q = 0.5, 2.0
    alpha_np = max(1.0, 1.0 / q)
    if use_atom:
        excess = 1.0 / p - alpha_np
        _, wp = rejection.membership(g, prev, cur_rows)
        wsum = jnp.sum(g.rows_wgt(cur_rows), axis=-1)
        wsum = jnp.where(
            g.rows_is_hub(cur_rows), g.rows_hub_wsum(cur_rows), wsum
        )
        theta = wp * excess / (
            wp * excess + alpha_np * jnp.maximum(wsum, 1e-30)
        )
    else:
        theta = wp = None
    key = jax.random.PRNGKey(7)
    ref = rejection._trial_block(
        g, key, prev, cur_rows, prev_rows, p, q, False, alpha_np, trials,
        theta, wp, mode="auto",
    )
    got = trialkernel.trial_block_fused(
        g, key, prev, cur_rows, prev_rows, p, q, alpha_np, trials,
        theta, wp, interpret=True,
    )
    for a, b_ in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_engine_fused_trial_walks_bitwise(rng, monkeypatch):
    adj, g = _int_weight_hub_graph(rng, n=20)
    assert g.symmetric
    start = jnp.asarray(rng.integers(0, 20, 64, dtype=np.int32))
    key = jax.random.PRNGKey(3)

    monkeypatch.setenv("PECANPY_TPU_FUSED_TRIAL", "0")
    w0, e0 = engine.generate_walks_amortized(g, start, key, 8, 0.5, 2.0,
                                             False)
    monkeypatch.setenv("PECANPY_TPU_FUSED_TRIAL", "1")
    w1, e1 = engine.generate_walks_amortized(g, start, key, 8, 0.5, 2.0,
                                             False)
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))


def test_engine_fused_trial_cdf_channel(rng, monkeypatch):
    """Parity holds with the precomputed-CDF proposal channel too."""
    adj, _ = _int_weight_hub_graph(rng, n=20)
    g = device_csr_from_dense(adj, degree_cap=4, with_cdf=True)
    start = jnp.asarray(rng.integers(0, 20, 48, dtype=np.int32))
    key = jax.random.PRNGKey(5)
    outs = []
    for flag in ("0", "1"):
        monkeypatch.setenv("PECANPY_TPU_FUSED_TRIAL", flag)
        outs.append(
            engine.generate_walks_amortized(g, start, key, 6, 0.5, 2.0,
                                            False)
        )
    np.testing.assert_array_equal(np.asarray(outs[0][0]),
                                  np.asarray(outs[1][0]))
