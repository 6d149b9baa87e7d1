"""Every walk mode through the full embed() pipeline (smoke).

Mirrors the reference's mode sweep (``test/test_pecanpy.py:30-41``):
each mode x input path must run read -> preprocess -> walk -> SGNS ->
graph-aligned embeddings without error.
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


@pytest.mark.parametrize("mode_cls", MODES, ids=lambda c: c.__name__)
def test_mode_from_mat_embed(mode_cls, rng):
    weighted = mode_cls not in (
        pecanpy.FirstOrderUnweighted,
    )
    adj = oracle.random_graph(rng, 20, mean_degree=5.0, weighted=weighted)
    ids = [str(i) for i in range(20)]
    kwargs = {}
    if mode_cls in (pecanpy.SparseOTF, pecanpy.DenseOTF):
        kwargs = dict(p=0.5, q=2.0)
    g = mode_cls.from_mat(adj, ids, random_state=0, **kwargs)
    emb = g.embed(dim=12, num_walks=2, walk_length=6, window_size=3)
    assert emb.shape == (20, 12)
    assert np.isfinite(emb).all()
    assert emb.std() > 0.0


@pytest.mark.parametrize("mode_cls", MODES, ids=lambda c: c.__name__)
def test_mode_read_edg_embed(mode_cls, karate_edg):
    g = mode_cls(random_state=1)
    g.read_edg(karate_edg, weighted=False, directed=False)
    emb = g.embed(dim=8, num_walks=2, walk_length=5, window_size=3)
    assert emb.shape == (34, 8)
    assert np.isfinite(emb).all()


def test_node2vec_plus_plus_embed(rng):
    adj = oracle.random_graph(rng, 16, mean_degree=5.0, weighted=True)
    ids = [str(i) for i in range(16)]
    g = Node2vecPlusPlus.from_mat(adj, ids, p=0.5, q=2.0, random_state=0)
    emb = g.embed(dim=8, num_walks=2, walk_length=5, window_size=3)
    assert emb.shape == (16, 8)
    assert np.isfinite(emb).all()


def test_extended_embed(rng):
    """node2vec+ (extend) through embed()."""
    adj = oracle.random_graph(rng, 16, mean_degree=5.0, weighted=True)
    ids = [str(i) for i in range(16)]
    g = pecanpy.SparseOTF.from_mat(
        adj, ids, p=0.5, q=2.0, extend=True, gamma=0.5, random_state=0
    )
    emb = g.embed(dim=8, num_walks=2, walk_length=5, window_size=3)
    assert emb.shape == (16, 8)
    assert np.isfinite(emb).all()
