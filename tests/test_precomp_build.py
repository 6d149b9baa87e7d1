"""Chunked PreComp edge-CDF build (transient-memory budget).

The one-shot build gathers [E, W] cur/prev row temporaries; the chunked
build slices edges under ``PECANPY_TPU_PRECOMP_BUILD_MB`` and must be
bit-identical (per-edge CDF rows are independent). Reference memory
concern: the Sigma deg^2 discussion at ``pecanpy.py:442-507``.
"""
import numpy as np

from pecanpy_tpu import pecanpy


def _adj(n=72, seed=11):
    rng = np.random.default_rng(seed)
    mask = rng.random((n, n)) < 0.22
    np.fill_diagonal(mask, False)
    upper = np.triu(np.where(mask, rng.uniform(0.5, 2.0, (n, n)), 0.0))
    adj = upper + upper.T
    for i in range(n):
        if adj[i].sum() == 0:
            j = (i + 1) % n
            adj[i, j] = adj[j, i] = 1.0
    return adj


def _build_cdf(adj, monkeypatch, budget_mb):
    monkeypatch.setenv("PECANPY_TPU_PRECOMP_BUILD_MB", str(budget_mb))
    ids = [str(i) for i in range(adj.shape[0])]
    g = pecanpy.PreComp.from_mat(adj, ids, p=0.5, q=2.0, random_state=0)
    g.preprocess_transition_probs()
    return np.asarray(g.edge_cdf)


def test_chunked_build_bit_identical_to_oneshot(monkeypatch):
    adj = _adj()
    e = int((adj != 0).sum())
    assert e > 512, "need enough edges to force multiple slices"
    one_shot = _build_cdf(adj, monkeypatch, budget_mb=1024)
    # budget 0 forces the 256-edge floor slice -> several dispatches
    chunked = _build_cdf(adj, monkeypatch, budget_mb=0)
    assert one_shot.shape[0] == e
    np.testing.assert_array_equal(chunked, one_shot)


def test_chunked_build_walks_still_valid(monkeypatch):
    monkeypatch.setenv("PECANPY_TPU_PRECOMP_BUILD_MB", "0")
    adj = _adj()
    ids = [str(i) for i in range(adj.shape[0])]
    g = pecanpy.PreComp.from_mat(adj, ids, p=0.5, q=2.0, random_state=0)
    walks, eff = g.simulate_walks_device(1, 6)
    walks, eff = np.asarray(walks), np.asarray(eff)
    for row, n in zip(walks, eff):
        for a, b in zip(row[: n - 1], row[1:n]):
            assert adj[a, b] != 0, f"non-edge {a}->{b}"
