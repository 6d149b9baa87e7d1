"""Native C++ edgelist parser: parity with the Python parser."""
import numpy as np
import pytest

from pecanpy_tpu import native
from pecanpy_tpu.graph import SparseGraph

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="g++ toolchain unavailable"
)


def write(path, rows, delimiter="\t"):
    with open(path, "w") as f:
        for r in rows:
            f.write(delimiter.join(str(x) for x in r) + "\n")


def parse_both(path, weighted, directed, delimiter="\t"):
    g_py = SparseGraph()
    g_py.read_edg(path, weighted, directed, delimiter, engine="python")
    g_nat = SparseGraph()
    g_nat.read_edg(path, weighted, directed, delimiter, engine="native")
    return g_py, g_nat


def assert_same(g_py, g_nat):
    assert g_py.nodes == g_nat.nodes
    np.testing.assert_array_equal(g_py.indptr, g_nat.indptr)
    np.testing.assert_array_equal(g_py.indices, g_nat.indices)
    np.testing.assert_allclose(g_py.data, g_nat.data, rtol=1e-6)


@pytest.mark.parametrize("directed", [False, True])
def test_weighted_parity(tmp_path, directed):
    path = str(tmp_path / "g.edg")
    write(path, [("a", "b", 1.5), ("b", "c", 2.0), ("c", "a", 0.25), ("a", "d", 3)])
    assert_same(*parse_both(path, True, directed))


def test_unweighted_parity(tmp_path):
    path = str(tmp_path / "g.edg")
    write(path, [("x", "y"), ("y", "z"), ("z", "x")])
    assert_same(*parse_both(path, False, False))


def test_karate_parity(karate_edg):
    g_py, g_nat = parse_both(karate_edg, False, False)
    assert_same(g_py, g_nat)


def test_delimiter_parity(tmp_path):
    path = str(tmp_path / "g.edg")
    write(path, [("a", "b", 2.0), ("b", "c", 1.0)], delimiter=",")
    assert_same(*parse_both(path, True, False, ","))


def test_nonpositive_dropped_with_warning(tmp_path):
    path = str(tmp_path / "g.edg")
    write(path, [("a", "b", 1.0), ("b", "c", -1.0), ("c", "d", 0.0)])
    g = SparseGraph()
    with pytest.warns(RuntimeWarning, match="Non-positive"):
        g.read_edg(path, True, False, engine="native")
    assert g.num_edges == 2
    assert g.nodes == ["a", "b"]


def test_duplicate_last_wins_with_warning(tmp_path):
    path = str(tmp_path / "g.edg")
    write(path, [("a", "b", 1.0), ("a", "b", 5.0)])
    g = SparseGraph()
    with pytest.warns(RuntimeWarning, match="duplicate"):
        g.read_edg(path, True, False, engine="native")
    assert g.data[0] == 5.0


def test_weighted_two_columns_rejected(tmp_path):
    path = str(tmp_path / "g.edg")
    write(path, [("a", "b")])
    g = SparseGraph()
    with pytest.raises(ValueError, match="three columns"):
        g.read_edg(path, True, False, engine="native")


def test_bad_weight_rejected(tmp_path):
    path = str(tmp_path / "g.edg")
    write(path, [("a", "b", "oops")])
    g = SparseGraph()
    with pytest.raises(ValueError, match="weight"):
        g.read_edg(path, True, False, engine="native")


def test_first_seen_node_order(tmp_path):
    path = str(tmp_path / "g.edg")
    write(path, [("z", "m", 1.0), ("a", "z", 2.0)])
    g = SparseGraph()
    g.read_edg(path, True, False, engine="native")
    assert g.nodes == ["z", "m", "a"]


def test_blank_lines_skipped(tmp_path):
    path = str(tmp_path / "g.edg")
    with open(path, "w") as f:
        f.write("a\tb\t1.0\n\n\nb\tc\t2.0\n")
    g = SparseGraph()
    g.read_edg(path, True, False, engine="native")
    assert g.num_nodes == 3
    assert g.num_edges == 4


# -- reference-semantics native walker (native/refwalker.cpp) ------------


def _adj_to_csr(adj):
    indptr = np.zeros(adj.shape[0] + 1, dtype=np.int64)
    indices, data = [], []
    for i in range(adj.shape[0]):
        nbrs = np.nonzero(adj[i])[0]
        indptr[i + 1] = indptr[i] + nbrs.size
        indices.append(nbrs)
        data.append(adj[i, nbrs])
    return (
        indptr,
        np.concatenate(indices).astype(np.int32),
        np.concatenate(data).astype(np.float32),
    )


@pytest.mark.skipif(
    not native.loader.native_available(), reason="no native toolchain"
)
@pytest.mark.parametrize("workers", [1, 3])
def test_refwalker_edges_and_termination(rng, workers):
    """Every consecutive pair is an edge; sinks terminate early with the
    effective length recorded and resting emission after it."""
    import oracle

    from pecanpy_tpu.native.loader import walk_node2vec_native

    n = 30
    adj = oracle.random_graph(rng, n, mean_degree=4.0, directed=True)
    adj[5, :] = 0.0  # sink node
    indptr, indices, data = _adj_to_csr(adj)
    starts = rng.integers(0, n, 500).astype(np.int32)
    walks, eff = walk_node2vec_native(
        indptr, indices, data, starts, 12, 0.5, 2.0, seed=3,
        workers=workers,
    )
    assert walks.shape == (500, 13)
    assert np.array_equal(walks[:, 0], starts)
    for row, e in zip(walks, eff):
        assert 1 <= e <= 13
        for a, b in zip(row[: e - 1], row[1 : e]):
            assert adj[a, b] > 0, f"non-edge {a}->{b}"
        assert (row[e - 1 :] == row[e - 1]).all()  # resting emission
        if e < 13:
            assert indptr[row[e - 1]] == indptr[row[e - 1] + 1]  # sink


@pytest.mark.skipif(
    not native.loader.native_available(), reason="no native toolchain"
)
def test_refwalker_transition_law(rng):
    """Empirical 1st/2nd-order transition frequencies match the numpy
    oracle of the reference kernels (sparse_rw.py:37-91)."""
    import oracle

    from pecanpy_tpu.native.loader import walk_node2vec_native

    n, p, q = 12, 0.5, 2.0
    adj = oracle.random_graph(rng, n, mean_degree=5.0, directed=False)
    indptr, indices, data = _adj_to_csr(adj)
    s = int(np.argmax(np.diff(indptr)))  # well-connected start
    walks, eff = walk_node2vec_native(
        indptr, indices, data,
        np.full(60_000, s, dtype=np.int32), 2, p, q, seed=11, workers=1,
    )
    assert (eff == 3).all()

    nbrs_s = indices[indptr[s] : indptr[s + 1]]
    f1 = np.array([(walks[:, 1] == x).mean() for x in nbrs_s])
    np.testing.assert_allclose(
        f1, oracle.first_order_probs(adj, s), atol=0.015
    )

    x = int(nbrs_s[np.argmax(f1)])  # best-sampled second state
    sel = walks[:, 1] == x
    nbrs_x = indices[indptr[x] : indptr[x + 1]]
    f2 = np.array([(walks[sel, 2] == y).mean() for y in nbrs_x])
    np.testing.assert_allclose(
        f2, oracle.node2vec_probs(adj, x, s, p, q), atol=0.025
    )
