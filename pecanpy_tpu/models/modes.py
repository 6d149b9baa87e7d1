"""The five walk modes, as step-function factories over the shared engine.

Reference mode classes: ``pecanpy.py:293-614``. Each mode differs only in
how a batch of walkers picks its next node; the walk driver, termination
semantics, and device layout are shared. The Sparse/Dense split of the
reference collapses on TPU — both feed the same padded row layout — so the
Dense classes differ only in which host container they parse into.
"""
import jax
import jax.numpy as jnp

from pecanpy_tpu.graph import DenseGraph, SparseGraph
from pecanpy_tpu.models.base import Base
from pecanpy_tpu.ops import sampling, transition
from pecanpy_tpu.ops.layout import DeviceCSR, build_device_csr, device_csr_from_dense


class _SparseModeBase(Base, SparseGraph):
    """Modes whose host container is the CSR ``SparseGraph``."""

    def _build_device_graph(self) -> DeviceCSR:
        return build_device_csr(
            self.indptr, self.indices, self.data, gamma=self.gamma
        )


class _DenseModeBase(Base, DenseGraph):
    """Modes whose host container is the dense ``DenseGraph``."""

    def _build_device_graph(self) -> DeviceCSR:
        return device_csr_from_dense(self.data, gamma=self.gamma)


def _pick_second_order_kernel(extend: bool):
    return transition.node2vec_plus_weights if extend else transition.node2vec_weights


def _otf_step_fns(p: float, q: float, extend: bool):
    """On-the-fly transition sampling: bias kernel + inverse-CDF draw.

    Semantics of the reference OTF move (``pecanpy.py:543-559``), batched.
    """
    kernel = _pick_second_order_kernel(extend)

    def first_fn(dg, aux, key, cur):
        weights = transition.first_order_weights(dg, cur)
        choice = sampling.categorical_rows(key, weights)
        return jnp.take_along_axis(dg.nbr[cur], choice[:, None], axis=1)[:, 0]

    def step_fn(dg, aux, key, cur, prev):
        weights = kernel(dg, cur, prev, p, q)
        choice = sampling.categorical_rows(key, weights)
        return jnp.take_along_axis(dg.nbr[cur], choice[:, None], axis=1)[:, 0]

    return first_fn, step_fn


class SparseOTF(_SparseModeBase):
    """Compute 2nd-order probabilities on the fly each step (default mode).

    Reference: ``pecanpy.py:510-561``.
    """

    def make_step_fns(self):
        return _otf_step_fns(self.p, self.q, self.extend)


class DenseOTF(_DenseModeBase):
    """OTF walking from a dense adjacency input.

    Reference: ``pecanpy.py:564-614``. Same transition law as SparseOTF —
    the padded device layout serves both; only host-side parsing differs.
    """

    def make_step_fns(self):
        return _otf_step_fns(self.p, self.q, self.extend)


class FirstOrderUnweighted(_SparseModeBase):
    """Uniform neighbor sampling; no probabilities at all.

    Reference: ``pecanpy.py:293-309`` — next = random entry of the CSR row.
    """

    def make_step_fns(self):
        def move(dg, aux, key, cur):
            kk = jax.random.randint(
                key, cur.shape, 0, jnp.maximum(dg.deg[cur], 1)
            )
            return jnp.take_along_axis(dg.nbr[cur], kk[:, None], axis=1)[:, 0]

        def first_fn(dg, aux, key, cur):
            return move(dg, aux, key, cur)

        def step_fn(dg, aux, key, cur, prev):
            return move(dg, aux, key, cur)

        return first_fn, step_fn


class PreCompFirstOrder(_SparseModeBase):
    """First-order weighted walks from per-node alias tables.

    Reference: ``pecanpy.py:312-361`` — one alias slot per edge. Here the
    tables are built on device in one vmapped pass over all N padded rows
    and stored as [N, D] arrays; each step is an O(1) alias draw per walker.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.alias_j = None
        self.alias_q = None

    def preprocess_transition_probs(self):
        dg = self.get_device_graph()
        self.alias_j, self.alias_q = jax.jit(sampling.alias_build)(
            dg.wgt, dg.deg
        )

    def _walk_aux(self):
        return (self.alias_j, self.alias_q)

    def make_step_fns(self):
        def move(dg, aux, key, cur):
            alias_j, alias_q = aux
            choice = sampling.alias_draw(key, alias_j, alias_q, cur, dg.deg[cur])
            return jnp.take_along_axis(dg.nbr[cur], choice[:, None], axis=1)[:, 0]

        def first_fn(dg, aux, key, cur):
            return move(dg, aux, key, cur)

        def step_fn(dg, aux, key, cur, prev):
            return move(dg, aux, key, cur)

        return first_fn, step_fn


class PreComp(_SparseModeBase):
    """Precompute 2nd-order transition alias tables for every (cur, prev).

    Reference: ``pecanpy.py:364-507`` — one alias table per directed edge
    (cur, prev-neighbor), total Sigma deg(i)^2 entries. Device layout here is
    [E, D] (one padded row per edge, addressed by flat edge id =
    indptr[cur] + position of prev in cur's row, as in ``pecanpy.py:426-436``).
    The same Sigma deg^2 memory blow-up on hub-heavy graphs applies — the
    mode-selection heuristics (``cli.py:226-254``) carry over unchanged.

    First step (no prev) samples the 1st-order distribution on the fly
    (``pecanpy.py:412-424``).
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.alias_j = None
        self.alias_q = None

    def preprocess_transition_probs(self):
        dg = self.get_device_graph()
        kernel = _pick_second_order_kernel(self.extend)
        p, q = self.p, self.q

        # One table row per directed edge (u -> x): the transition
        # distribution out of u given the walker arrived from x.
        edge_cur, flat_pos = _flat_edge_positions(dg)
        edge_prev = dg.nbr.reshape(-1)[flat_pos]  # [E] prev node per table row

        @jax.jit
        def build(dg, edge_cur, edge_prev):
            weights = kernel(dg, edge_cur, edge_prev, p, q)  # [E, D]
            return sampling.alias_build(weights, dg.deg[edge_cur])

        self.alias_j, self.alias_q = build(dg, edge_cur, edge_prev)

    def _walk_aux(self):
        return (self.alias_j, self.alias_q)

    def make_step_fns(self):
        first_fn, _ = _otf_step_fns(self.p, self.q, self.extend)

        def step_fn(dg, aux, key, cur, prev):
            alias_j, alias_q = aux
            cur_nbr = dg.nbr[cur]  # [B, D]
            pos = transition.row_searchsorted(cur_nbr, prev[:, None])[:, 0]
            pos = jnp.minimum(pos, cur_nbr.shape[1] - 1).astype(jnp.int32)
            edge_row = dg.indptr[cur] + pos
            choice = sampling.alias_draw(
                key, alias_j, alias_q, edge_row, dg.deg[cur]
            )
            return jnp.take_along_axis(cur_nbr, choice[:, None], axis=1)[:, 0]

        return first_fn, step_fn


def _flat_edge_positions(dg: DeviceCSR):
    """Per-edge (source node, flat index into the padded [N, D] rows)."""
    e = int(dg.indptr[-1])
    edge_cur = jnp.repeat(
        jnp.arange(dg.num_nodes, dtype=jnp.int32), dg.deg, total_repeat_length=e
    )
    local = jnp.arange(e, dtype=jnp.int32) - dg.indptr[edge_cur]
    return edge_cur, edge_cur * dg.max_degree + local
