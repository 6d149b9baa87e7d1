"""Multi-device tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from pecanpy_tpu.models.sgns import SGNSConfig
from pecanpy_tpu.ops.layout import device_csr_from_dense
from pecanpy_tpu.parallel import mesh as mesh_lib
from pecanpy_tpu.parallel.train import MultichipTrainer


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def test_make_mesh_shapes(eight_devices):
    m = mesh_lib.make_mesh(8, model_parallel=2)
    assert m.shape == {"data": 4, "model": 2}
    m1 = mesh_lib.make_mesh(8)
    assert m1.shape == {"data": 8, "model": 1}
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(8, model_parallel=3)


def test_multichip_fused_step(eight_devices, rng):
    adj = oracle.random_graph(rng, 32, mean_degree=4.0)
    graph = device_csr_from_dense(adj)
    m = mesh_lib.make_mesh(8, model_parallel=2)
    config = SGNSConfig(dim=16, window=3, negative=2, seed=0)
    trainer = MultichipTrainer(
        mesh=m, graph=graph, config=config, walk_length=8, p=0.5, q=2.0
    )
    key = jax.random.PRNGKey(0)
    w_in, w_out = trainer.init_params(key)
    assert w_in.sharding.spec == jax.sharding.PartitionSpec(None, "model")

    keep_prob = jnp.ones(32)
    neg_table = jnp.arange(32, dtype=jnp.int32)  # uniform negatives
    starts = trainer.shard_batch(np.arange(32, dtype=np.int32).repeat(2))

    w_in2, w_out2 = trainer.step(
        w_in, w_out, starts, keep_prob, neg_table, 0.025, key
    )
    assert w_in2.shape == (32, 16)
    assert np.isfinite(np.asarray(w_in2)).all()
    # training moved the parameters
    assert float(jnp.abs(w_out2).sum()) > 0.0


def test_sharded_walks_match_semantics(eight_devices, rng):
    """Sharded walk batches still follow graph edges."""
    adj = oracle.random_graph(rng, 16, mean_degree=4.0)
    graph = device_csr_from_dense(adj)
    m = mesh_lib.make_mesh(8)
    config = SGNSConfig(dim=8, window=2, negative=2, seed=0)
    trainer = MultichipTrainer(mesh=m, graph=graph, config=config, walk_length=5)

    from pecanpy_tpu.models import engine
    from pecanpy_tpu.ops import sampling, transition

    def first_fn(k, cur, cur_rows):
        w = transition.first_order_weights_rows(trainer.graph, cur_rows)
        c = sampling.categorical_rows(k, w)
        return sampling.pick_int_columns(trainer.graph.rows_nbr(cur_rows), c)

    def step_fn(k, cur, prev, cur_rows, prev_rows):
        w = transition.node2vec_weights_rows(
            trainer.graph, cur_rows, prev_rows, prev, 1.0, 1.0
        )
        c = sampling.categorical_rows(k, w)
        return sampling.pick_int_columns(trainer.graph.rows_nbr(cur_rows), c)

    starts = trainer.shard_batch(np.tile(np.arange(16, dtype=np.int32), 4))
    walks, eff = jax.jit(
        lambda s, k: engine.generate_walks(
            trainer.graph, first_fn, step_fn, s, k, 5
        )
    )(starts, jax.random.PRNGKey(1))
    walks, eff = np.asarray(walks), np.asarray(eff)
    for row, n in zip(walks, eff):
        for a, b in zip(row[: n - 1], row[1:n]):
            assert adj[a, b] != 0


def test_multichip_hub_graph_step(eight_devices, rng):
    """Hub-marker graphs train on the mesh via the rejection path."""
    adj = oracle.random_graph(rng, 24, mean_degree=8.0, weighted=True)
    graph = device_csr_from_dense(adj, degree_cap=4)
    assert graph.has_hubs
    m = mesh_lib.make_mesh(8, model_parallel=2)
    config = SGNSConfig(dim=16, window=3, negative=2, seed=0)
    trainer = MultichipTrainer(
        mesh=m, graph=graph, config=config, walk_length=6, p=0.5, q=2.0
    )
    key = jax.random.PRNGKey(0)
    w_in, w_out = trainer.init_params(key)
    starts = trainer.shard_batch(np.arange(24, dtype=np.int32).repeat(2))
    w_in, w_out = trainer.step(
        w_in, w_out, starts, jnp.ones(24), jnp.arange(24, dtype=jnp.int32),
        0.025, key,
    )
    assert np.isfinite(np.asarray(w_in)).all()
    assert float(jnp.abs(np.asarray(w_out)).sum()) > 0.0


def test_multichip_count_tokens(eight_devices, rng):
    adj = oracle.random_graph(rng, 16, mean_degree=4.0)
    graph = device_csr_from_dense(adj)
    m = mesh_lib.make_mesh(8)
    config = SGNSConfig(dim=8, window=2, negative=2, seed=0)
    trainer = MultichipTrainer(
        mesh=m, graph=graph, config=config, walk_length=5
    )
    starts = np.tile(np.arange(16, dtype=np.int32), 4)
    counts = np.asarray(
        trainer.count_tokens(starts, jax.random.PRNGKey(0))
    )
    # every walk contributes between 1 and walk_length+1 tokens
    assert counts.sum() >= starts.size
    assert counts.sum() <= starts.size * 6


def test_multichip_embed_end_to_end(eight_devices, rng):
    from pecanpy_tpu import pecanpy

    adj = oracle.random_graph(rng, 20, mean_degree=5.0, weighted=True)
    ids = [str(i) for i in range(20)]
    g = pecanpy.SparseOTF.from_mat(adj, ids, p=0.5, q=2.0, random_state=3)
    emb = g.embed(
        dim=16, num_walks=4, walk_length=8, window_size=3,
        n_devices=8, model_parallel=2,
    )
    assert emb.shape == (20, 16)
    assert np.isfinite(emb).all()
    assert emb.std() > 0.0


def test_multichip_cli_devices(eight_devices, tmp_path, karate_edg):
    from pecanpy_tpu import cli

    out = tmp_path / "k.emb.npz"
    cli.main([
        "--input", karate_edg, "--output", str(out),
        "--dimensions", "8", "--walk-length", "5", "--num-walks", "2",
        "--window-size", "3", "--random_state", "0",
        "--devices", "8", "--model-parallel", "2",
    ])
    z = np.load(out)
    assert z["data"].shape == (34, 8)
    assert np.isfinite(z["data"]).all()


def test_multichip_streaming_checkpoint_resume(eight_devices, rng, tmp_path):
    """The mesh streaming trainer resumes from a snapshot: a fresh run and
    an interrupted+resumed run produce identical embeddings."""
    from pecanpy_tpu.parallel.train import train_streaming_multichip

    pytest.importorskip("orbax.checkpoint")
    adj = oracle.random_graph(rng, 20, mean_degree=5.0, weighted=True)
    graph = device_csr_from_dense(adj)
    m = mesh_lib.make_mesh(8, model_parallel=2)
    config = SGNSConfig(dim=16, window=3, negative=2, seed=0)
    starts = np.tile(np.arange(20, dtype=np.int32), 6)

    def trainer():
        return MultichipTrainer(
            mesh=m, graph=graph, config=config, walk_length=6, p=0.5, q=2.0
        )

    full = train_streaming_multichip(
        trainer(), starts, epochs=2, seed=5, batch=40
    )
    ckpt_dir = str(tmp_path / "ck")
    # interrupted run (same 2-epoch plan, stopped after 3 steps),
    # snapshotting every step; then resume to completion
    train_streaming_multichip(
        trainer(), starts, epochs=2, seed=5, batch=40,
        checkpoint_dir=ckpt_dir, checkpoint_every=1, max_steps=3,
    )
    resumed = train_streaming_multichip(
        trainer(), starts, epochs=2, seed=5, batch=40,
        checkpoint_dir=ckpt_dir, checkpoint_every=1,
    )
    np.testing.assert_allclose(full, resumed, atol=1e-6)
