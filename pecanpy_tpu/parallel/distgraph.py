"""Edge-partitioned walking: the graph sharded across the mesh.

The reference is strictly single-host (SURVEY §5: its only parallelism is
Numba threads). `parallel/train.py` scales *walkers* with a replicated
graph — enough until the graph itself outgrows one chip's HBM. This
module removes that ceiling: the fused row table row-shards over the
``data`` axis (shard s owns the contiguous node range
[s * rows_per_shard, ...)), walkers stay sharded, and the per-step row
fetch becomes a collective:

    all_gather the batch's node ids          (tiny: 4 B per walker)
    each shard gathers the rows it owns      (local fast-path gather)
    psum combines the masked partial rows    (the bandwidth cost)

This "fetch by all-reduce" exchange is deliberately the simple, exactly
load-balanced formulation: every shard does identical work regardless of
which shard owns a walker's node, there are no capacity/overflow concerns,
and XLA lays the psum onto ICI. The traffic-optimal variant (request/
response all-to-all, O(B/S) per link instead of O(B)) is the documented
follow-up; it changes only ``gather_rows`` here.

Scope: fused-path modes (SparseOTF / DenseOTF / FirstOrderUnweighted,
with or without node2vec+). Hub structures and PreComp tables are not
row-shardable yet — ``shard_graph`` rejects graphs that need them.
"""
import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pecanpy_tpu.models import engine
from pecanpy_tpu.ops import rejection, sampling, transition
from pecanpy_tpu.ops.layout import DeviceCSR
from pecanpy_tpu.parallel.mesh import DATA_AXIS


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedDeviceCSR(DeviceCSR):
    """Per-shard view of a row-sharded fused table (lives inside shard_map).

    ``fused`` holds only this shard's rows; ``gather_rows`` runs the
    collective exchange. All row-level accessors (``rows_nbr`` etc.)
    operate on gathered rows and are inherited unchanged.
    """

    global_nodes: int = dataclasses.field(
        metadata=dict(static=True), default=0
    )
    axis: str = dataclasses.field(
        metadata=dict(static=True), default=DATA_AXIS
    )
    exchange: str = dataclasses.field(
        metadata=dict(static=True), default="psum"
    )
    capacity: int = dataclasses.field(
        metadata=dict(static=True), default=0
    )

    @property
    def num_nodes(self) -> int:  # sentinel space is the GLOBAL node count
        return self.global_nodes

    @property
    def rows_per_shard(self) -> int:
        return self.fused.shape[0]

    def gather_rows(self, idx: jax.Array) -> jax.Array:
        if self.exchange == "alltoall":
            return self._gather_rows_a2a(idx)
        return self._gather_rows_psum(idx)

    def _gather_rows_psum(self, idx: jax.Array) -> jax.Array:
        """Collective row fetch: all_gather ids, local gather, psum rows.

        The combine runs in the int32 domain: fused rows carry int32
        payloads bitcast into float32 lanes (neighbor ids), which are
        *denormals* as floats — a float psum flushes them to zero on
        FTZ hardware. Integer adds are exact; the float payloads survive
        the int round-trip bit-for-bit.
        """
        all_idx = jax.lax.all_gather(idx, self.axis, tiled=True)  # [B]
        base = jax.lax.axis_index(self.axis) * self.rows_per_shard
        local = all_idx - base
        mine = (local >= 0) & (local < self.rows_per_shard)
        rows = self.fused[jnp.clip(local, 0, self.rows_per_shard - 1)]
        rows_i = jax.lax.bitcast_convert_type(rows, jnp.int32)
        rows_i = jnp.where(mine[:, None], rows_i, 0)
        rows_i = jax.lax.psum(rows_i, self.axis)  # [B, W] exact
        # back to this shard's slice of the batch
        b_local = idx.shape[0]
        start = jax.lax.axis_index(self.axis) * b_local
        rows_i = jax.lax.dynamic_slice(
            rows_i, (start, 0), (b_local, rows_i.shape[1])
        )
        return jax.lax.bitcast_convert_type(rows_i, jnp.float32)

    def _gather_rows_a2a(self, idx: jax.Array) -> jax.Array:
        """Request/response row fetch over all_to_all.

        Per round: each shard packs up to ``capacity`` not-yet-served
        requests per owner into a [S, CAP] id buffer, all_to_all routes
        the buffers to their owners, owners gather their rows locally,
        and a second all_to_all returns [S, CAP, W] replies. Walkers
        whose request did not fit retry next round; the loop runs until
        every lane is served (expected: one round).
        """
        b = idx.shape[0]
        s_axis = jax.lax.axis_size(self.axis)
        cap = self.capacity
        w = self.fused.shape[1]
        rps = self.rows_per_shard
        my = jax.lax.axis_index(self.axis)

        def round_body(state):
            rows_out, served, _pending, _t = state
            owner = jnp.where(served, s_axis, idx // rps)  # served -> nowhere
            # rank of each pending lane within its owner group
            onehot = owner[:, None] == jnp.arange(s_axis)[None, :]  # [b, S]
            rank = jnp.cumsum(onehot, axis=0) - 1  # occurrences before me
            rank = jnp.sum(jnp.where(onehot, rank, 0), axis=1)
            fits = (~served) & (rank < cap)
            slot = jnp.where(fits, owner * cap + rank, s_axis * cap)
            send_ids = (
                jnp.full((s_axis * cap,), -1, dtype=jnp.int32)
                .at[slot]
                .set(idx, mode="drop")
                .reshape(s_axis, cap)
            )
            # route requests to owners: recv[k] = shard k's requests to me
            recv_ids = jax.lax.all_to_all(
                send_ids, self.axis, split_axis=0, concat_axis=0, tiled=True
            )
            local = recv_ids - my * rps
            valid = (local >= 0) & (local < rps)
            got = self.fused[jnp.clip(local, 0, rps - 1)]
            got_i = jax.lax.bitcast_convert_type(got, jnp.int32)
            got_i = jnp.where(valid[:, :, None], got_i, 0)
            # route replies back to the requesters
            back = jax.lax.all_to_all(
                got_i.reshape(s_axis, cap, w),
                self.axis,
                split_axis=0,
                concat_axis=0,
                tiled=True,
            ).reshape(s_axis * cap, w)
            mine = back[jnp.clip(slot, 0, s_axis * cap - 1)]
            rows_out = jnp.where(fits[:, None], mine, rows_out)
            served = served | fits
            # the retry decision must be GLOBAL: a shard that exits the
            # loop early while another retries would deadlock the
            # all_to_all, so every shard carries the summed pending count
            pending = jax.lax.psum(jnp.sum(~served), self.axis)
            return rows_out, served, pending, _t + 1

        def cond(state):
            _, _, pending, t = state
            return (pending > 0) & (t < b + 1)

        rows0 = jnp.zeros((b, w), dtype=jnp.int32)
        served0 = jnp.zeros((b,), dtype=bool)
        rows_i, _, _, _ = jax.lax.while_loop(
            cond, round_body, (rows0, served0, jnp.int32(1), jnp.int32(0))
        )
        return jax.lax.bitcast_convert_type(rows_i, jnp.float32)


def shard_graph(
    graph: DeviceCSR, mesh: Mesh
) -> Tuple[DeviceCSR, int]:
    """Pad + device_put the fused table row-sharded over the data axis.

    Returns (sharded graph container, rows_per_shard). The returned
    object still carries the full logical metadata; ``distributed_walk``
    re-wraps each shard's slice as a ``ShardedDeviceCSR`` inside
    shard_map.
    """
    if graph.has_hubs:
        raise NotImplementedError(
            "row-sharded walking does not cover hub structures yet; "
            "raise degree_cap or use the replicated-graph path"
        )
    n_shards = mesh.shape[DATA_AXIS]
    n = graph.fused.shape[0]
    rows = -(-n // n_shards)
    pad = rows * n_shards - n
    fused = graph.fused
    if pad:
        # padded rows read as zero-degree sentinels (nbr bitcast 0.0 is
        # node id 0 — but their weight row is 0 and no walker can reach
        # them: node ids stay < n)
        fused = jnp.pad(fused, ((0, pad), (0, 0)))
    sharding = NamedSharding(mesh, P(DATA_AXIS, None))
    fused = jax.device_put(fused, sharding)
    out = dataclasses.replace(graph, fused=fused)
    return out, rows


def distributed_walk_fn(
    mesh: Mesh,
    graph: DeviceCSR,
    rows_per_shard: int,
    walk_length: int,
    p: float = 1.0,
    q: float = 1.0,
    extend: bool = False,
    mode: str = "SparseOTF",
    exchange: str = "psum",
    capacity: Optional[int] = None,
):
    """Compiled sharded walk program: starts sharded in, walks sharded out.

    The walk engine runs unchanged inside ``shard_map``; only
    ``gather_rows`` differs (the collective fetch above).
    """
    num_nodes = graph.num_nodes
    kernel = (
        transition.node2vec_plus_weights_rows
        if extend
        else transition.node2vec_weights_rows
    )

    n_shards = mesh.shape[DATA_AXIS]

    def walk(fused_local, threshold, starts_local, key):
        b_local = starts_local.shape[0]
        cap = capacity
        if cap is None:
            mean = max(b_local // n_shards, 1)
            cap = mean + 4 * int(np.sqrt(mean)) + 8
        dg = ShardedDeviceCSR(
            fused=fused_local,
            deg=jnp.zeros(0, jnp.int32),  # unused in the fused path
            threshold=threshold,
            indptr=jnp.zeros(0, jnp.int32),
            channels=graph.channels,
            dpad=graph.dpad,
            max_degree=graph.max_degree,
            gamma=graph.gamma,
            global_nodes=num_nodes,
            exchange=exchange,
            capacity=cap,
        )
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))

        if mode == "FirstOrderUnweighted":
            def first_fn(k, cur, cur_rows):
                return rejection.uniform_propose(dg, k, cur_rows)

            def step_fn(k, cur, prev, cur_rows, prev_rows):
                return rejection.uniform_propose(dg, k, cur_rows)
        else:
            def first_fn(k, cur, cur_rows):
                w = transition.first_order_weights_rows(dg, cur_rows)
                c = sampling.categorical_rows(k, w)
                return sampling.pick_int_columns(dg.rows_nbr(cur_rows), c)

            def step_fn(k, cur, prev, cur_rows, prev_rows):
                w = kernel(dg, cur_rows, prev_rows, prev, p, q)
                c = sampling.categorical_rows(k, w)
                return sampling.pick_int_columns(dg.rows_nbr(cur_rows), c)

        return engine.generate_walks(
            dg, first_fn, step_fn, starts_local, key, walk_length
        )

    mapped = jax.shard_map(
        walk,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(), P(DATA_AXIS), P()),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS)),
        check_vma=False,
    )

    @jax.jit
    def run(fused, threshold, starts, key):
        return mapped(fused, threshold, starts, key)

    return run


def simulate_walks_distributed(
    graph: DeviceCSR,
    mesh: Mesh,
    starts: np.ndarray,
    walk_length: int,
    p: float = 1.0,
    q: float = 1.0,
    extend: bool = False,
    mode: str = "SparseOTF",
    seed: Optional[int] = 0,
    exchange: str = "psum",
    capacity: Optional[int] = None,
):
    """One-call sharded walk generation over an edge-partitioned graph."""
    sharded, rows = shard_graph(graph, mesh)
    n_shards = mesh.shape[DATA_AXIS]
    b = starts.size
    pad = (-b) % n_shards
    starts = np.pad(np.asarray(starts, dtype=np.int32), (0, pad))
    starts_dev = jax.device_put(
        jnp.asarray(starts), NamedSharding(mesh, P(DATA_AXIS))
    )
    fn = distributed_walk_fn(
        mesh, graph, rows, walk_length, p, q, extend, mode,
        exchange=exchange, capacity=capacity,
    )
    walks, eff = fn(
        sharded.fused, sharded.threshold, starts_dev,
        jax.random.PRNGKey(seed or 0),
    )
    if pad:
        walks, eff = walks[:-pad], eff[:-pad]
    return walks, eff
