"""Walk-engine semantics and distributional correctness.

The reference pins golden walks tied to its exact RNG-consumption order
(``test/test_walk.py``); a vectorized sampler cannot match that stream, so
per SURVEY §4 these become distributional tests: empirical transition
frequencies must match the exact transition law, and structural walk
semantics (edges only, early termination, reproducibility) are asserted
directly.
"""
import numpy as np
import pytest

import oracle
from pecanpy_tpu import pecanpy
from pecanpy_tpu.experimental import Node2vecPlusPlus

MODES = [
    pecanpy.SparseOTF,
    pecanpy.DenseOTF,
    pecanpy.PreComp,
    pecanpy.PreCompFirstOrder,
    pecanpy.FirstOrderUnweighted,
]


def make_graph(mode_cls, adj, **kwargs):
    ids = [str(i) for i in range(adj.shape[0])]
    return mode_cls.from_mat(adj, ids, **kwargs)


def walk_arrays(g, num_walks, walk_length):
    walks, eff = g.simulate_walks_device(num_walks, walk_length)
    return np.asarray(walks), np.asarray(eff)


@pytest.mark.parametrize("mode_cls", MODES)
def test_walks_follow_edges(mode_cls, rng):
    weighted = mode_cls not in (pecanpy.FirstOrderUnweighted,)
    adj = oracle.random_graph(rng, 12, mean_degree=4.0, weighted=weighted)
    g = make_graph(mode_cls, adj, random_state=0)
    walks, eff = walk_arrays(g, num_walks=2, walk_length=6)
    assert walks.shape == (24, 7)
    for row, n in zip(walks, eff):
        for a, b in zip(row[: n - 1], row[1:n]):
            assert adj[a, b] != 0, f"non-edge {a}->{b}"


def test_start_nodes_cover_every_node(rng):
    adj = oracle.random_graph(rng, 9, mean_degree=3.0)
    g = make_graph(pecanpy.SparseOTF, adj, random_state=1)
    walks, _ = walk_arrays(g, num_walks=3, walk_length=4)
    starts = np.sort(walks[:, 0])
    np.testing.assert_array_equal(starts, np.sort(np.tile(np.arange(9), 3)))


def test_early_termination_at_sink():
    # directed path 0 -> 1 -> 2, node 2 is a sink
    adj = np.zeros((3, 3))
    adj[0, 1] = adj[1, 2] = 1.0
    ids = ["0", "1", "2"]
    g = pecanpy.SparseOTF.from_mat(adj, ids, random_state=0)
    # from_mat treats the matrix as given (directed structure preserved)
    walks, eff = g.simulate_walks_device(1, 5)
    walks, eff = np.asarray(walks), np.asarray(eff)
    by_start = {int(w[0]): (w, e) for w, e in zip(walks, eff)}
    # start at sink: effective length 1
    assert by_start[2][1] == 1
    # start at 1: one step to 2 then stop -> effective length 2
    assert by_start[1][1] == 2
    np.testing.assert_array_equal(by_start[1][0][:2], [1, 2])
    # start at 0: 0,1,2 then stop -> effective length 3
    assert by_start[0][1] == 3
    np.testing.assert_array_equal(by_start[0][0][:3], [0, 1, 2])


def test_reproducible_with_seed(rng):
    adj = oracle.random_graph(rng, 10, mean_degree=4.0)
    g1 = make_graph(pecanpy.SparseOTF, adj, random_state=42)
    g2 = make_graph(pecanpy.SparseOTF, adj, random_state=42)
    w1, e1 = walk_arrays(g1, 2, 5)
    w2, e2 = walk_arrays(g2, 2, 5)
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(e1, e2)


def test_simulate_walks_string_output(karate_edg):
    g = pecanpy.SparseOTF(random_state=0)
    g.read_edg(karate_edg, weighted=False, directed=False)
    walks = g.simulate_walks(1, 3)
    assert len(walks) == 34
    assert all(isinstance(w, list) for w in walks)
    assert all(tok in g._node_idmap for w in walks for tok in w)


def empirical_second_order_counts(walks, eff, n):
    """Count (prev, cur -> nxt) triples from step 2 onward."""
    counts = {}
    for row, m in zip(walks, eff):
        for j in range(2, m):
            key = (row[j - 2], row[j - 1])
            counts.setdefault(key, []).append(row[j])
    return counts


@pytest.mark.parametrize(
    "mode_cls,p,q,extend",
    [
        (pecanpy.SparseOTF, 1.0, 1.0, False),
        (pecanpy.SparseOTF, 0.5, 2.0, False),
        (pecanpy.SparseOTF, 0.5, 2.0, True),
        (pecanpy.PreComp, 0.5, 2.0, False),
        (pecanpy.DenseOTF, 2.0, 0.5, False),
    ],
)
def test_second_order_distribution(mode_cls, p, q, extend, rng):
    """Empirical 2nd-order transition frequencies match the oracle law."""
    adj = oracle.random_graph(rng, 8, mean_degree=3.5, weighted=True)
    g = make_graph(
        mode_cls, adj, p=p, q=q, extend=extend, gamma=0.0, random_state=7
    )
    walks, eff = walk_arrays(g, num_walks=600, walk_length=4)
    counts = empirical_second_order_counts(walks, eff, 8)

    checked = 0
    for (prev, cur), nxts in counts.items():
        if len(nxts) < 400:
            continue
        nbrs = np.nonzero(adj[cur])[0]
        if extend:
            expected = oracle.node2vec_plus_probs(adj, cur, prev, p, q, 0.0)
        else:
            expected = oracle.node2vec_probs(adj, cur, prev, p, q)
        freq = np.array([(np.array(nxts) == nb).mean() for nb in nbrs])
        np.testing.assert_allclose(
            freq, expected, atol=4.5 * np.sqrt(0.25 / len(nxts)),
            err_msg=f"cur={cur} prev={prev} n={len(nxts)}",
        )
        checked += 1
    assert checked >= 3, "not enough high-count transitions to test"


def test_first_order_unweighted_uniform(rng):
    adj = oracle.random_graph(rng, 6, mean_degree=3.0, weighted=False)
    g = make_graph(pecanpy.FirstOrderUnweighted, adj, random_state=3)
    walks, eff = walk_arrays(g, num_walks=800, walk_length=4)
    # first-step frequencies from each start node must be uniform over nbrs
    for node in range(6):
        nbrs = np.nonzero(adj[node])[0]
        if nbrs.size < 2:
            continue
        rows = walks[(walks[:, 0] == node) & (eff > 1)]
        freq = np.array([(rows[:, 1] == nb).mean() for nb in nbrs])
        np.testing.assert_allclose(freq, 1.0 / nbrs.size, atol=0.06)


def test_node2vec_pp_mode_runs(rng):
    adj = oracle.random_graph(rng, 8, mean_degree=3.0)
    g = make_graph(Node2vecPlusPlus, adj, p=1.0, q=2.0, gamma=0.0, random_state=0)
    walks, eff = walk_arrays(g, 2, 5)
    for row, n in zip(walks, eff):
        for a, b in zip(row[: n - 1], row[1:n]):
            assert adj[a, b] != 0


def test_precomp_first_order_matches_weights(rng):
    adj = oracle.random_graph(rng, 6, mean_degree=3.0, weighted=True)
    g = make_graph(pecanpy.PreCompFirstOrder, adj, random_state=5)
    walks, eff = walk_arrays(g, num_walks=800, walk_length=3)
    for node in range(6):
        nbrs = np.nonzero(adj[node])[0]
        if nbrs.size < 2:
            continue
        rows = walks[(walks[:, 0] == node) & (eff > 1)]
        expected = oracle.first_order_probs(adj, node)
        freq = np.array([(rows[:, 1] == nb).mean() for nb in nbrs])
        np.testing.assert_allclose(freq, expected, atol=0.07)


def test_scalar_compat_callbacks(rng):
    """Reference-parity scalar callbacks: has_nbrs / move_forward."""
    adj = oracle.random_graph(rng, 8, mean_degree=3.0)
    adj[3, :] = 0  # make node 3 a sink in the directed sense
    adj[:, 3] = 0
    g = make_graph(pecanpy.SparseOTF, adj, p=0.5, q=2.0, random_state=0)
    has_nbrs = g.get_has_nbrs()
    assert has_nbrs(3) is False
    move = g.get_move_forward()
    start = next(i for i in range(8) if i != 3 and adj[i].sum() > 0)
    nxt = move(start)
    assert adj[start, nxt] != 0
    nxt2 = move(nxt, start)
    assert adj[nxt, nxt2] != 0
    thresholds = g.get_noise_thresholds()
    assert thresholds.shape == (8,)


def test_precomp_wide_degree_fallback(rng):
    """PreComp edges of nodes wider than PRECOMP_WIDTH sample via the OTF
    fallback — the same 2nd-order law, computed instead of looked up."""
    n = 90
    adj = oracle.random_graph(rng, n, mean_degree=4.0, weighted=True)
    hub = 0  # make node 0 wider than the 64-slot precomputed rows
    adj[hub, 1:] = rng.uniform(0.5, 2.0, n - 1)
    adj[1:, hub] = adj[hub, 1:]
    p, q = 0.5, 2.0
    g = make_graph(pecanpy.PreComp, adj, p=p, q=q, random_state=9)
    g.preprocess_transition_probs()
    assert g.edge_cdf.shape[1] == 64
    assert g.get_device_graph().dpad > 64  # fallback path is compiled

    walks, eff = walk_arrays(g, num_walks=500, walk_length=4)
    counts = empirical_second_order_counts(walks, eff, n)
    checked_wide = 0
    for (prev, cur), nxts in counts.items():
        if len(nxts) < 350 or cur != hub:
            continue
        nbrs = np.nonzero(adj[cur])[0]
        expected = oracle.node2vec_probs(adj, cur, prev, p, q)
        freq = np.array([(np.array(nxts) == nb).mean() for nb in nbrs])
        np.testing.assert_allclose(
            freq, expected, atol=4.5 * np.sqrt(0.25 / len(nxts)) + 0.02,
            err_msg=f"cur={cur} prev={prev} n={len(nxts)}",
        )
        checked_wide += 1
    assert checked_wide >= 1, "no high-count transitions through the hub"


def test_uncapped_fused_memory_guard(monkeypatch):
    """degree_cap=None on a skewed graph must raise before allocating the
    O(N * max_degree) fused table (a synthetic 100k-degree hub would pad
    every row to 100k slots)."""
    import scipy.sparse as sp

    n = 100_001
    hub_deg = n - 1
    # star graph: node 0 adjacent to everyone (degree 100k)
    rows = np.concatenate([np.zeros(hub_deg, np.int64), np.arange(1, n)])
    cols = np.concatenate([np.arange(1, n), np.zeros(hub_deg, np.int64)])
    mat = sp.csr_matrix(
        (np.ones(rows.size, np.float32), (rows, cols)), shape=(n, n)
    )
    monkeypatch.setenv("PECANPY_TPU_FUSED_BUDGET_MB", "1024")
    g = pecanpy.PreComp(p=0.5, q=2.0, random_state=0)
    g.indptr = mat.indptr.astype(np.uint32)
    g.indices = mat.indices.astype(np.uint32)
    g.data = mat.data
    g.set_node_ids(None, implicit_ids=True, num_nodes=n)
    with pytest.raises(ValueError, match="uncapped fused layout"):
        g.get_device_graph()
