"""Edge-partitioned (row-sharded graph) walking on the virtual CPU mesh."""
import jax
import numpy as np
import pytest

import oracle
from pecanpy_tpu.ops.layout import device_csr_from_dense
from pecanpy_tpu.parallel import mesh as mesh_lib
from pecanpy_tpu.parallel.distgraph import (
    shard_graph,
    simulate_walks_distributed,
)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_lib.make_mesh(8)


def test_sharded_walks_follow_edges(mesh8, rng):
    adj = oracle.random_graph(rng, 16, mean_degree=4.0, weighted=True)
    graph = device_csr_from_dense(adj)
    starts = np.tile(np.arange(16, dtype=np.int32), 8)
    walks, eff = simulate_walks_distributed(
        graph, mesh8, starts, walk_length=6, p=0.5, q=2.0, seed=3
    )
    walks, eff = np.asarray(walks), np.asarray(eff)
    assert walks.shape == (128, 7)
    np.testing.assert_array_equal(np.sort(walks[:, 0]), np.sort(starts))
    for row, n in zip(walks, eff):
        for a, b in zip(row[: n - 1], row[1:n]):
            assert adj[a, b] != 0, f"non-edge {a}->{b}"


def test_sharded_second_order_distribution(mesh8, rng):
    """Row-sharded walking must follow the exact 2nd-order law."""
    adj = oracle.random_graph(rng, 8, mean_degree=3.5, weighted=True)
    graph = device_csr_from_dense(adj)
    p, q = 0.5, 2.0
    starts = np.tile(np.arange(8, dtype=np.int32), 400)
    walks, eff = simulate_walks_distributed(
        graph, mesh8, starts, walk_length=4, p=p, q=q, seed=11
    )
    walks, eff = np.asarray(walks), np.asarray(eff)

    counts = {}
    for row, m in zip(walks, eff):
        for j in range(2, m):
            counts.setdefault((row[j - 2], row[j - 1]), []).append(row[j])

    checked = 0
    for (prev, cur), nxts in counts.items():
        if len(nxts) < 400:
            continue
        nbrs = np.nonzero(adj[cur])[0]
        expected = oracle.node2vec_probs(adj, cur, prev, p, q)
        freq = np.array([(np.array(nxts) == nb).mean() for nb in nbrs])
        np.testing.assert_allclose(
            freq, expected, atol=4.5 * np.sqrt(0.25 / len(nxts)),
            err_msg=f"cur={cur} prev={prev} n={len(nxts)}",
        )
        checked += 1
    assert checked >= 3, "not enough high-count transitions to test"


def test_sharded_hub_walks_follow_edges(mesh8, rng):
    """Hub tables row-sharded: rejection fetches ride the collective."""
    adj = oracle.random_graph(rng, 14, mean_degree=8.0, weighted=True)
    graph = device_csr_from_dense(adj, degree_cap=6)
    assert graph.has_hubs
    sharded, meta = shard_graph(graph, mesh8)
    assert meta.ep_rows > 0 and meta.hb_rows > 0
    starts = np.tile(np.arange(14, dtype=np.int32), 8)
    walks, eff = simulate_walks_distributed(
        graph, mesh8, starts, walk_length=5, p=0.5, q=2.0, seed=5
    )
    walks, eff = np.asarray(walks), np.asarray(eff)
    for row, n in zip(walks, eff):
        for a, b in zip(row[: n - 1], row[1:n]):
            assert adj[a, b] != 0, f"non-edge {a}->{b}"


def test_sharded_hub_second_order_distribution(mesh8, rng):
    """Forced-cap 2nd-order law through the collective rejection path."""
    adj = oracle.random_graph(rng, 8, mean_degree=5.0, weighted=True)
    graph = device_csr_from_dense(adj, degree_cap=4)
    assert graph.has_hubs
    p, q = 0.5, 2.0
    starts = np.tile(np.arange(8, dtype=np.int32), 500)
    walks, eff = simulate_walks_distributed(
        graph, mesh8, starts, walk_length=4, p=p, q=q, seed=11
    )
    walks, eff = np.asarray(walks), np.asarray(eff)
    counts = {}
    for row, m in zip(walks, eff):
        for j in range(2, m):
            counts.setdefault((row[j - 2], row[j - 1]), []).append(row[j])
    checked = 0
    for (prev, cur), nxts in counts.items():
        if len(nxts) < 400:
            continue
        nbrs = np.nonzero(adj[cur])[0]
        expected = oracle.node2vec_probs(adj, cur, prev, p, q)
        freq = np.array([(np.array(nxts) == nb).mean() for nb in nbrs])
        np.testing.assert_allclose(
            freq, expected, atol=4.5 * np.sqrt(0.25 / len(nxts)),
            err_msg=f"cur={cur} prev={prev} n={len(nxts)}",
        )
        checked += 1
    assert checked >= 3, "not enough high-count transitions to test"


def test_first_order_unweighted_sharded(mesh8, rng):
    adj = oracle.random_graph(rng, 12, mean_degree=4.0, weighted=False)
    graph = device_csr_from_dense(adj)
    starts = np.tile(np.arange(12, dtype=np.int32), 4)
    walks, eff = simulate_walks_distributed(
        graph, mesh8, starts, walk_length=5, mode="FirstOrderUnweighted",
        seed=0,
    )
    walks, eff = np.asarray(walks), np.asarray(eff)
    for row, n in zip(walks, eff):
        for a, b in zip(row[: n - 1], row[1:n]):
            assert adj[a, b] != 0


@pytest.mark.parametrize("capacity", [None, 2])
def test_alltoall_exchange_follows_edges(mesh8, rng, capacity):
    """Request/response exchange; capacity=2 forces multi-round retries."""
    adj = oracle.random_graph(rng, 16, mean_degree=4.0, weighted=True)
    graph = device_csr_from_dense(adj)
    starts = np.tile(np.arange(16, dtype=np.int32), 8)
    walks, eff = simulate_walks_distributed(
        graph, mesh8, starts, walk_length=6, p=0.5, q=2.0, seed=3,
        exchange="alltoall", capacity=capacity,
    )
    walks, eff = np.asarray(walks), np.asarray(eff)
    for row, n in zip(walks, eff):
        for a, b in zip(row[: n - 1], row[1:n]):
            assert adj[a, b] != 0, f"non-edge {a}->{b}"


def test_alltoall_second_order_distribution(mesh8, rng):
    adj = oracle.random_graph(rng, 8, mean_degree=3.5, weighted=True)
    graph = device_csr_from_dense(adj)
    p, q = 0.5, 2.0
    starts = np.tile(np.arange(8, dtype=np.int32), 400)
    walks, eff = simulate_walks_distributed(
        graph, mesh8, starts, walk_length=4, p=p, q=q, seed=11,
        exchange="alltoall",
    )
    walks, eff = np.asarray(walks), np.asarray(eff)
    counts = {}
    for row, m in zip(walks, eff):
        for j in range(2, m):
            counts.setdefault((row[j - 2], row[j - 1]), []).append(row[j])
    checked = 0
    for (prev, cur), nxts in counts.items():
        if len(nxts) < 400:
            continue
        nbrs = np.nonzero(adj[cur])[0]
        expected = oracle.node2vec_probs(adj, cur, prev, p, q)
        freq = np.array([(np.array(nxts) == nb).mean() for nb in nbrs])
        np.testing.assert_allclose(
            freq, expected, atol=4.5 * np.sqrt(0.25 / len(nxts)),
            err_msg=f"cur={cur} prev={prev}",
        )
        checked += 1
    assert checked >= 3


def test_exchange_cost_model_and_auto():
    """The cost model's psum volume scales with shard count while a2a
    stays ~flat; auto picks psum on tiny meshes, a2a on larger ones."""
    from pecanpy_tpu.parallel.distgraph import (
        exchange_cost_model,
        resolve_exchange,
    )

    width = 128
    m2 = exchange_cost_model(4096, 2, width)
    m8 = exchange_cost_model(4096, 8, width)
    m16 = exchange_cost_model(4096, 16, width)
    # psum moves the full global batch's rows: linear in S
    assert m16["psum_bytes"] > 7 * m2["psum_bytes"] * 0.9
    # a2a moves only the requested rows (+ slack): near-flat in S
    assert m16["a2a_bytes"] < 2 * m2["a2a_bytes"]
    assert m8["pick"] == "alltoall" and m16["pick"] == "alltoall"
    assert resolve_exchange("psum", 4096, 16, width) == "psum"
    assert resolve_exchange("auto", 4096, 16, width) == "alltoall"


def test_auto_exchange_walks_follow_edges(mesh8, rng):
    """The default (auto-resolved) exchange samples valid walks."""
    adj = oracle.random_graph(rng, 16, mean_degree=4.0, weighted=True)
    graph = device_csr_from_dense(adj)
    starts = np.tile(np.arange(16, dtype=np.int32), 8)
    walks, eff = simulate_walks_distributed(
        graph, mesh8, starts, walk_length=6, p=0.5, q=2.0, seed=3,
        exchange="auto",
    )
    walks, eff = np.asarray(walks), np.asarray(eff)
    for row, n in zip(walks, eff):
        for a, b in zip(row[: n - 1], row[1:n]):
            assert adj[a, b] != 0, f"non-edge {a}->{b}"
