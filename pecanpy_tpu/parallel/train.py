"""Multi-device fused training step: sharded walks + sharded SGNS update.

One jitted program per step: a batch of walkers (sharded over the ``data``
mesh axis) advances ``walk_length`` steps over the replicated graph, the
resulting walks expand into skip-gram pairs, and the tensor-parallel
embedding tables (sharded over ``model``) take one SGNS SGD update. GSPMD
derives all collectives from the sharding annotations: a ``psum`` over
``model`` for the pair scores, an all-reduce over ``data`` for the table
updates.
"""
import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pecanpy_tpu.models import engine, sgns
from pecanpy_tpu.models.sgns import SGNSConfig
from pecanpy_tpu.ops import sampling, transition
from pecanpy_tpu.ops.layout import DeviceCSR
from pecanpy_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


@dataclasses.dataclass
class MultichipTrainer:
    """Holds the mesh, sharded state, and the compiled fused step."""

    mesh: Mesh
    graph: DeviceCSR
    config: SGNSConfig
    walk_length: int
    p: float = 1.0
    q: float = 1.0
    extend: bool = False

    def __post_init__(self):
        if self.graph.has_hubs:
            # fused-only step fns would mis-decode hub marker rows as
            # neighbor lists (silently corrupt walks); route such graphs
            # through modes._otf_step_fns on one device, or raise
            # degree_cap (mirrors distgraph.shard_graph's guard)
            raise NotImplementedError(
                "MultichipTrainer's fused step does not cover hub "
                "structures; raise degree_cap or walk on a single device"
            )
        self._table_sharding = NamedSharding(self.mesh, P(None, MODEL_AXIS))
        self._batch_sharding = NamedSharding(self.mesh, P(DATA_AXIS))
        self._repl_sharding = NamedSharding(self.mesh, P())
        self.graph = jax.device_put(self.graph, self._repl_sharding)
        self._step = self._build_step()

    def init_params(self, key: jax.Array):
        """Sharded (w_in, w_out) tables."""
        n, d = self.graph.num_nodes, self.config.dim
        bound = 0.5 / d
        w_in = jax.random.uniform(key, (n, d), minval=-bound, maxval=bound)
        w_out = jnp.zeros((n, d), dtype=jnp.float32)
        return (
            jax.device_put(w_in, self._table_sharding),
            jax.device_put(w_out, self._table_sharding),
        )

    def shard_batch(self, starts):
        return jax.device_put(jnp.asarray(starts), self._batch_sharding)

    def _build_step(self) -> Callable:
        p, q = self.p, self.q
        kernel = (
            transition.node2vec_plus_weights_rows
            if self.extend
            else transition.node2vec_weights_rows
        )
        walk_length = self.walk_length
        sgns_body = sgns.make_step_body(self.graph.num_nodes, self.config)

        def fused_step(graph, w_in, w_out, starts, keep_prob, neg_table, lr, key):
            k_walk, k_sgns = jax.random.split(key)

            def first_fn(k, cur, cur_rows):
                w = transition.first_order_weights_rows(graph, cur_rows)
                c = sampling.categorical_rows(k, w)
                return sampling.pick_int_columns(graph.rows_nbr(cur_rows), c)

            def step_fn(k, cur, prev, cur_rows, prev_rows):
                w = kernel(graph, cur_rows, prev_rows, prev, p, q)
                c = sampling.categorical_rows(k, w)
                return sampling.pick_int_columns(graph.rows_nbr(cur_rows), c)

            walks, eff = engine.generate_walks(
                graph, first_fn, step_fn, starts, k_walk, walk_length
            )
            w_in, w_out = sgns_body(
                w_in, w_out, walks, eff, keep_prob, neg_table, lr, k_sgns
            )
            return w_in, w_out

        return jax.jit(
            fused_step,
            in_shardings=(
                self._repl_sharding,  # graph (pytree: leaves replicated)
                self._table_sharding,
                self._table_sharding,
                self._batch_sharding,
                self._repl_sharding,
                self._repl_sharding,
                None,
                None,
            ),
            out_shardings=(self._table_sharding, self._table_sharding),
            donate_argnums=(1, 2),
        )

    def step(self, w_in, w_out, starts, keep_prob, neg_table, lr, key):
        """One fused walk + SGNS update step.

        ``neg_table`` is a shuffled unigram^0.75 sampling table
        (``sgns.build_negative_table``), replicated across the mesh.
        """
        return self._step(
            self.graph, w_in, w_out, starts, keep_prob, neg_table,
            jnp.float32(lr), key,
        )
