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
