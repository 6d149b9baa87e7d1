"""Graph container and I/O tests.

Modeled on the reference test strategy (``test/test_graph.py``): tiny
hand-written fixtures expressed as (adjacency matrix, CSR triple, edge
list) and cross-checked across every container and conversion path.
"""
import numpy as np
import pytest
import scipy.sparse

from pecanpy_tpu.graph import AdjlstGraph, BaseGraph, DenseGraph, SparseGraph

# 4-node weighted graph with a deliberate node-ordering trap (node "c"
# appears first as a destination) and a directed sink (node "d" has no
# out-edges in the directed variant).
IDS = ["a", "c", "b", "d"]
MAT = np.array(
    [
        [0.0, 1.5, 2.0, 0.0],
        [1.5, 0.0, 0.5, 0.0],
        [2.0, 0.5, 0.0, 1.0],
        [0.0, 0.0, 1.0, 0.0],
    ]
)
# CSR with ascending neighbor indices per row
INDPTR = np.array([0, 2, 4, 7, 8], dtype=np.uint32)
INDICES = np.array([1, 2, 0, 2, 0, 1, 3, 2], dtype=np.uint32)
DATA = np.array([1.5, 2.0, 1.5, 0.5, 2.0, 0.5, 1.0, 1.0], dtype=np.float32)

EDG_LINES = [
    ("a", "c", 1.5),
    ("a", "b", 2.0),
    ("c", "b", 0.5),
    ("b", "d", 1.0),
]


def write_edg(path, lines, weighted=True, delimiter="\t"):
    with open(path, "w") as f:
        for h, t, w in lines:
            cols = [h, t] + ([str(w)] if weighted else [])
            f.write(delimiter.join(cols) + "\n")


class TestBaseGraph:
    def test_implicit_ids_warns(self):
        g = BaseGraph()
        with pytest.warns(UserWarning, match="Implicitly set node IDs"):
            g.set_node_ids(None, num_nodes=3)
        assert g.nodes == ["0", "1", "2"]

    def test_implicit_ids_silent_when_confirmed(self, recwarn):
        g = BaseGraph()
        g.set_node_ids(None, implicit_ids=True, num_nodes=2)
        assert g.nodes == ["0", "1"]
        assert not recwarn.list

    def test_implicit_requires_num_nodes(self):
        with pytest.raises(ValueError):
            BaseGraph().set_node_ids(None)

    def test_density(self):
        g = SparseGraph.from_mat(MAT, IDS)
        assert g.density == pytest.approx(8 / (4 * 3))


class TestAdjlstGraph:
    def test_read_and_node_order(self, tmp_path):
        path = tmp_path / "g.edg"
        write_edg(path, EDG_LINES)
        g = AdjlstGraph()
        g.read(str(path), weighted=True, directed=False)
        assert g.nodes == IDS  # first-seen order
        assert g.num_edges == 8

    def test_nonpositive_edge_dropped(self, tmp_path):
        path = tmp_path / "g.edg"
        write_edg(path, [("a", "b", 1.0), ("b", "c", 0.0), ("c", "d", -2.0)])
        g = AdjlstGraph()
        with pytest.warns(RuntimeWarning, match="Non-positive edge ignored"):
            g.read(str(path), weighted=True, directed=False)
        assert g.num_edges == 2  # only a<->b survives
        # nodes still registered? reference only registers on valid edges
        assert g.nodes == ["a", "b"]

    def test_duplicate_edge_last_wins(self, tmp_path):
        path = tmp_path / "g.edg"
        write_edg(path, [("a", "b", 1.0), ("a", "b", 2.0)])
        g = AdjlstGraph()
        with pytest.warns(RuntimeWarning, match="exists"):
            g.read(str(path), weighted=True, directed=False)
        assert dict((t, w) for h, t, w in g.edges if h == 0)[1] == 2.0

    def test_duplicate_same_weight_silent(self, tmp_path, recwarn):
        path = tmp_path / "g.edg"
        write_edg(path, [("a", "b", 1.0), ("a", "b", 1.0)])
        g = AdjlstGraph()
        g.read(str(path), weighted=True, directed=False)
        assert not [w for w in recwarn.list if "exists" in str(w.message)]

    def test_weighted_needs_three_columns(self, tmp_path):
        path = tmp_path / "g.edg"
        write_edg(path, [("a", "b", 1.0)], weighted=False)
        g = AdjlstGraph()
        with pytest.raises(ValueError, match="three columns"):
            g.read(str(path), weighted=True, directed=False)

    @pytest.mark.parametrize("delimiter", ["\t", ",", " "])
    def test_delimiters(self, tmp_path, delimiter):
        path = tmp_path / "g.edg"
        write_edg(path, EDG_LINES, delimiter=delimiter)
        g = AdjlstGraph()
        g.read(str(path), weighted=True, directed=False, delimiter=delimiter)
        assert g.num_edges == 8

    def test_directed(self, tmp_path):
        path = tmp_path / "g.edg"
        write_edg(path, EDG_LINES)
        g = AdjlstGraph()
        g.read(str(path), weighted=True, directed=True)
        assert g.num_edges == 4

    def test_to_csr_sorted_rows(self):
        g = AdjlstGraph.from_mat(MAT, IDS)
        indptr, indices, data = g.to_csr()
        np.testing.assert_array_equal(indptr, INDPTR)
        np.testing.assert_array_equal(indices, INDICES)
        np.testing.assert_allclose(data, DATA)

    def test_to_dense(self):
        g = AdjlstGraph.from_mat(MAT, IDS)
        np.testing.assert_allclose(g.to_dense(), MAT)

    def test_edg_round_trip(self, tmp_path):
        path = tmp_path / "g.edg"
        write_edg(path, EDG_LINES)
        g = AdjlstGraph()
        g.read(str(path), weighted=True, directed=False)
        out = tmp_path / "out.edg"
        g.save(str(out))
        g2 = AdjlstGraph()
        g2.read(str(out), weighted=True, directed=False)
        np.testing.assert_allclose(g.to_dense(), g2.to_dense())

    def test_unweighted_save(self, tmp_path):
        g = AdjlstGraph.from_mat(MAT, IDS)
        out = tmp_path / "out.edg"
        g.save(str(out), unweighted=True)
        assert all(len(line.split("\t")) == 2 for line in open(out))


class TestSparseGraph:
    def test_from_mat_matches_read_edg(self, tmp_path):
        path = tmp_path / "g.edg"
        write_edg(path, EDG_LINES)
        g1 = SparseGraph.from_mat(MAT, IDS)
        g2 = SparseGraph()
        g2.read_edg(str(path), weighted=True, directed=False)
        np.testing.assert_array_equal(g1.indptr, g2.indptr)
        np.testing.assert_array_equal(g1.indices, g2.indices)
        np.testing.assert_allclose(g1.data, g2.data)
        assert g1.nodes == g2.nodes

    def test_npz_round_trip(self, tmp_path):
        g = SparseGraph.from_mat(MAT, IDS)
        path = tmp_path / "g.csr.npz"
        g.save(str(path))
        g2 = SparseGraph()
        g2.read_npz(str(path), weighted=True)
        assert list(g2.nodes) == IDS
        np.testing.assert_array_equal(g.indices, g2.indices)
        np.testing.assert_allclose(g.data, g2.data)

    def test_npz_unweighted_flattens_weights(self, tmp_path):
        g = SparseGraph.from_mat(MAT, IDS)
        path = tmp_path / "g.csr.npz"
        g.save(str(path))
        g2 = SparseGraph()
        g2.read_npz(str(path), weighted=False)
        assert (g2.data == 1.0).all()

    def test_scipy_interop(self, tmp_path):
        sp = scipy.sparse.csr_matrix(MAT)
        path = tmp_path / "sp.npz"
        scipy.sparse.save_npz(str(path), sp)
        g = SparseGraph()
        with pytest.warns(UserWarning, match="Implicitly set node IDs"):
            g.read_npz(str(path), weighted=True)
        assert g.nodes == ["0", "1", "2", "3"]
        np.testing.assert_allclose(
            np.asarray(g.data), sp.data.astype(np.float32)
        )

    def test_num_edges_empty_raises(self):
        with pytest.raises(ValueError, match="Empty graph"):
            SparseGraph().num_edges

    def test_from_adjlst(self):
        adj = AdjlstGraph.from_mat(MAT, IDS)
        g = SparseGraph.from_adjlst_graph(adj)
        np.testing.assert_array_equal(g.indptr, INDPTR)


class TestDenseGraph:
    def test_from_mat(self):
        g = DenseGraph.from_mat(MAT, IDS)
        np.testing.assert_allclose(g.data, MAT)
        np.testing.assert_array_equal(g.nonzero, MAT != 0)
        assert g.num_edges == 8

    def test_nonzero_tracks_data(self):
        g = DenseGraph.from_mat(MAT, IDS)
        g.data = np.zeros_like(MAT)
        assert g.num_edges == 0

    def test_npz_round_trip(self, tmp_path):
        g = DenseGraph.from_mat(MAT, IDS)
        path = tmp_path / "g.dense.npz"
        g.save(str(path))
        g2 = DenseGraph()
        g2.read_npz(str(path), weighted=True)
        np.testing.assert_allclose(g2.data, MAT)
        assert list(g2.nodes) == IDS

    def test_npz_unweighted(self, tmp_path):
        g = DenseGraph.from_mat(MAT, IDS)
        path = tmp_path / "g.dense.npz"
        g.save(str(path))
        g2 = DenseGraph()
        g2.read_npz(str(path), weighted=False)
        np.testing.assert_allclose(g2.data, (MAT != 0) * 1.0)

    def test_read_edg(self, tmp_path):
        path = tmp_path / "g.edg"
        write_edg(path, EDG_LINES)
        g = DenseGraph()
        g.read_edg(str(path), weighted=True, directed=False)
        np.testing.assert_allclose(g.data, MAT)

    def test_from_adjlst(self):
        adj = AdjlstGraph.from_mat(MAT, IDS)
        g = DenseGraph.from_adjlst_graph(adj)
        np.testing.assert_allclose(g.data, MAT)


def test_karate_load(karate_edg):
    g = SparseGraph()
    g.read_edg(karate_edg, weighted=False, directed=False)
    assert g.num_nodes == 34
    # 78 lines, one duplicate pair (9-33) -> 77 unique undirected edges
    assert g.num_edges == 154


class TestEdgesSymmetric:
    """Build-time symmetry detection (`ops/layout.edges_symmetric`)."""

    def _csr(self, adj):
        import numpy as np

        adj = np.asarray(adj, dtype=np.float32)
        rows, cols = np.nonzero(adj)
        deg = np.bincount(rows, minlength=adj.shape[0])
        indptr = np.concatenate([[0], np.cumsum(deg)])
        return indptr, cols, adj[rows, cols]

    def test_symmetric_weighted(self):
        import numpy as np

        from pecanpy_tpu.ops.layout import edges_symmetric

        rng = np.random.default_rng(0)
        w = rng.uniform(0.1, 2.0, (12, 12))
        adj = np.triu(w, 1)
        adj = adj + adj.T
        adj[adj < 1.0] = 0.0
        assert edges_symmetric(*self._csr(adj))

    def test_asymmetric_weight_detected(self):
        import numpy as np

        from pecanpy_tpu.ops.layout import edges_symmetric

        adj = np.zeros((4, 4), np.float32)
        adj[0, 1] = adj[1, 0] = 1.0
        adj[2, 3] = 1.0
        adj[3, 2] = 2.0  # both directions exist, weights differ
        assert not edges_symmetric(*self._csr(adj))

    def test_missing_reverse_edge_detected(self):
        import numpy as np

        from pecanpy_tpu.ops.layout import edges_symmetric

        adj = np.zeros((3, 3), np.float32)
        adj[0, 1] = adj[1, 0] = 1.0
        adj[1, 2] = 1.0  # no 2 -> 1
        assert not edges_symmetric(*self._csr(adj))

    def test_empty_graph_symmetric(self):
        import numpy as np

        from pecanpy_tpu.ops.layout import edges_symmetric

        assert edges_symmetric(
            np.zeros(5, np.int64), np.zeros(0, np.int64),
            np.zeros(0, np.float32),
        )

    def test_device_csr_records_flag(self):
        import numpy as np

        from pecanpy_tpu.ops.layout import build_device_csr

        adj = np.zeros((4, 4), np.float32)
        adj[0, 1] = adj[1, 0] = 1.0
        g = build_device_csr(*self._csr(adj))
        assert g.symmetric
        adj[2, 3] = 1.0
        g2 = build_device_csr(*self._csr(adj))
        assert not g2.symmetric
        g3 = build_device_csr(*self._csr(adj), symmetric=True)  # override
        assert g3.symmetric
