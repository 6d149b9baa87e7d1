"""Batched transition kernels vs. the scalar numpy oracle.

The oracle (``tests/oracle.py``) replicates the reference's per-node math
(``sparse_rw.py``, ``dense_rw.py``, ``experimental.py``). The device
kernels must reproduce every (cur, prev) transition distribution exactly
(up to float32 tolerance), including padded-slot behavior.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from pecanpy_tpu.ops import transition
from pecanpy_tpu.ops.layout import build_device_csr, device_csr_from_dense


def to_device_graph(adj, gamma=0.0):
    return device_csr_from_dense(adj, gamma=gamma)


def normalize_rows(weights, deg):
    """Strip padding and normalize kernel output for one batch element."""
    out = []
    weights = np.asarray(weights)
    for row, d in zip(weights, deg):
        w = row[:d]
        out.append(w / w.sum())
    return out


def all_pairs(adj):
    """Every (cur, prev) pair where prev is a neighbor of cur."""
    pairs = [
        (c, p) for c in range(adj.shape[0]) for p in np.nonzero(adj[c])[0]
    ]
    return np.array(pairs, dtype=np.int32)


@pytest.fixture(params=[(12, True, False), (20, True, False), (15, False, False)])
def adj(request, rng):
    n, weighted, directed = request.param
    a = oracle.random_graph(rng, n, mean_degree=5.0, weighted=weighted)
    # ensure no isolated "cur" rows sneak into the pair set trivially
    return a


def test_first_order_matches_oracle(adj):
    g = to_device_graph(adj)
    deg = np.asarray(g.deg)
    cur = np.array([i for i in range(adj.shape[0]) if deg[i] > 0], dtype=np.int32)
    w = transition.first_order_weights(g, jnp.asarray(cur))
    got = normalize_rows(w, deg[cur])
    for i, c in enumerate(cur):
        np.testing.assert_allclose(
            got[i], oracle.first_order_probs(adj, c), rtol=1e-5
        )


@pytest.mark.parametrize("p,q", [(1.0, 1.0), (0.5, 2.0), (4.0, 0.25)])
def test_node2vec_matches_oracle(adj, p, q):
    g = to_device_graph(adj)
    pairs = all_pairs(adj)
    cur, prev = pairs[:, 0], pairs[:, 1]
    w = transition.node2vec_weights(g, jnp.asarray(cur), jnp.asarray(prev), p, q)
    got = normalize_rows(w, np.asarray(g.deg)[cur])
    for i, (c, pr) in enumerate(pairs):
        expected = oracle.node2vec_probs(adj, c, pr, p, q)
        np.testing.assert_allclose(got[i], expected, rtol=1e-5, err_msg=f"{c=},{pr=}")


@pytest.mark.parametrize("p,q,gamma", [(1.0, 1.0, 0.0), (0.5, 2.0, 0.0), (2.0, 0.5, 1.0)])
def test_node2vec_plus_matches_oracle(adj, p, q, gamma):
    g = to_device_graph(adj, gamma=gamma)
    pairs = all_pairs(adj)
    cur, prev = pairs[:, 0], pairs[:, 1]
    w = transition.node2vec_plus_weights(
        g, jnp.asarray(cur), jnp.asarray(prev), p, q
    )
    got = normalize_rows(w, np.asarray(g.deg)[cur])
    for i, (c, pr) in enumerate(pairs):
        expected = oracle.node2vec_plus_probs(adj, c, pr, p, q, gamma)
        np.testing.assert_allclose(
            got[i], expected, rtol=1e-4, err_msg=f"{c=},{pr=}"
        )


@pytest.mark.parametrize("p,q,gamma", [(1.0, 2.0, 0.0), (1.0, 0.5, 0.5)])
def test_node2vec_pp_matches_oracle(adj, p, q, gamma):
    g = to_device_graph(adj, gamma=gamma)
    pairs = all_pairs(adj)
    cur, prev = pairs[:, 0], pairs[:, 1]
    w = transition.node2vec_pp_weights(
        g, jnp.asarray(cur), jnp.asarray(prev), p, q
    )
    got = normalize_rows(w, np.asarray(g.deg)[cur])
    for i, (c, pr) in enumerate(pairs):
        expected = oracle.node2vec_pp_probs(adj, c, pr, p, q, gamma)
        np.testing.assert_allclose(
            got[i], expected, rtol=1e-4, err_msg=f"{c=},{pr=}"
        )


def test_unweighted_extend_equals_plain_node2vec(rng):
    """node2vec+ == node2vec on unweighted graphs (reference cli.py:286)."""
    adj = oracle.random_graph(rng, 14, mean_degree=4.0, weighted=False)
    g = to_device_graph(adj)
    pairs = all_pairs(adj)
    cur, prev = jnp.asarray(pairs[:, 0]), jnp.asarray(pairs[:, 1])
    w1 = transition.node2vec_weights(g, cur, prev, 1.0, 2.0)
    w2 = transition.node2vec_plus_weights(g, cur, prev, 1.0, 2.0)
    deg = np.asarray(g.deg)[pairs[:, 0]]
    for a, b in zip(normalize_rows(w1, deg), normalize_rows(w2, deg)):
        np.testing.assert_allclose(a, b, rtol=1e-5)


def test_csr_and_dense_layouts_agree(rng):
    adj = oracle.random_graph(rng, 10, mean_degree=4.0)
    rows, cols = np.nonzero(adj)
    deg = np.bincount(rows, minlength=10)
    indptr = np.concatenate([[0], np.cumsum(deg)])
    g1 = build_device_csr(indptr, cols, adj[rows, cols], gamma=0.5)
    g2 = device_csr_from_dense(adj, gamma=0.5)
    np.testing.assert_array_equal(np.asarray(g1.nbr), np.asarray(g2.nbr))
    np.testing.assert_allclose(np.asarray(g1.wgt), np.asarray(g2.wgt))
    np.testing.assert_allclose(
        np.asarray(g1.threshold), np.asarray(g2.threshold), rtol=1e-5
    )


def test_noise_thresholds_match_oracle(rng):
    adj = oracle.random_graph(rng, 16, mean_degree=5.0)
    gamma = 1.5
    g = to_device_graph(adj, gamma=gamma)
    expected = oracle.noise_thresholds(adj, gamma)
    np.testing.assert_allclose(
        np.asarray(g.threshold)[:-1], expected, rtol=1e-5, atol=1e-6
    )
