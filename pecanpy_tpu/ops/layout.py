"""Fused-row device layout for TPU walk kernels.

The reference walks a scalar CSR one node at a time (Numba closures over
``indptr``/``indices``/``data``, ``src/pecanpy/rw/sparse_rw.py:133-139``).
On TPU the equivalent structure is a *fused padded row table*: everything a
walk step needs about a node — neighbor ids, edge weights, and mode-specific
extras (noise thresholds of the neighbors, precomputed CDFs) — lives in ONE
fixed-width float32 row, channel-packed:

    fused[i] = [ nbr (int32 bitcast) | wgt | extras... ]    width = C * dpad

so a batch of B walkers fetches all per-node state with a single gather.

Why one wide row instead of separate nbr/wgt matrices: on TPU (v5e measured)
XLA's gather hits a fast path when the gathered row slice is >= 64 lanes of
float32 (256 B) — ~73M rows/s vs ~2M rows/s for narrow rows. Fusing the
channels turns 2-4 slow gathers per walk step into one fast one (~7x total
walk throughput). Memory is free: the TPU tiles the minor dimension to 128
lanes anyway, so [N, 38] and [N, 64] occupy identical HBM.

Layout invariants (the transition kernels rely on all of these):

* ``nbr`` channel slots ``[0, deg)`` list neighbors in **ascending order**
  (same sorted-row invariant as the reference CSR, ``graph.py:323-341``),
  stored as int32 bitcast to float32 (never touched by float arithmetic).
* nbr padding is the sentinel ``num_nodes`` — strictly greater than any real
  node index, so padded rows stay sorted and the sentinel never collides
  with a real neighbor during membership tests.
* ``wgt`` channel is 0 at padded positions, so padded entries carry zero
  probability through every bias path without extra masking.
* ``thr`` channel (node2vec+ modes) holds the noise threshold of the
  *neighbor* in that slot: ``thr[i, j] = threshold[nbr[i, j]]``; padding 1.0.
  The current node's own threshold is recomputed on the fly from the wgt
  channel (pure VPU math — cheaper than another memory access).
* ``cdf`` channel (PreComp* modes) holds the normalized inclusive CDF of the
  node's first-order transition distribution; padding 1.0.

Degree skew note: rows are padded to the max degree (rounded up to 64
lanes). On power-law graphs with huge hubs this explodes — the same reason
the reference splits PreComp/SparseOTF/DenseOTF modes; a hub-splitting /
bucketed layout is the planned extension. The layout abstraction boundary
(everything goes through ``DeviceCSR`` accessors) keeps that change local.
"""
import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LANE = 64  # fused channel width granularity (f32 lanes; fast-gather floor)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceCSR:
    """Channel-packed padded neighbor table resident on device.

    Attributes:
        fused: [N, C * dpad] float32 fused rows (C = number of channels).
        deg: [N] int32 true degree of each node.
        threshold: [N + 1] float32 node2vec+ noise thresholds
            (mean + gamma * std of each node's edge weights, clipped at 0;
            reference: ``sparse_rw.py:22-35``). Sentinel slot = 1.0.
        indptr: [N + 1] int32 row offsets of the flat CSR — kept for the
            PreComp per-edge table addressing scheme (edge id = indptr[cur]
            + local neighbor position, ``pecanpy.py:426-436``).
        channels: static channel-name tuple, e.g. ("nbr", "wgt").
        dpad: static padded slots per channel (multiple of 64).
        max_degree: static true max degree.
    """

    fused: jax.Array
    deg: jax.Array
    threshold: jax.Array
    indptr: jax.Array
    channels: Tuple[str, ...] = dataclasses.field(
        metadata=dict(static=True), default=("nbr", "wgt")
    )
    dpad: int = dataclasses.field(metadata=dict(static=True), default=LANE)
    max_degree: int = dataclasses.field(metadata=dict(static=True), default=0)
    gamma: float = dataclasses.field(metadata=dict(static=True), default=0.0)

    @property
    def num_nodes(self) -> int:
        return self.fused.shape[0]

    # -- channel accessors ---------------------------------------------------

    def channel(self, rows: jax.Array, name: str) -> jax.Array:
        """Slice channel ``name`` out of gathered fused rows [B, C * dpad]."""
        c = self.channels.index(name)
        return rows[..., c * self.dpad : (c + 1) * self.dpad]

    def rows_nbr(self, rows: jax.Array) -> jax.Array:
        """[B, dpad] int32 neighbor ids from gathered rows."""
        return jax.lax.bitcast_convert_type(
            self.channel(rows, "nbr"), jnp.int32
        )

    def rows_wgt(self, rows: jax.Array) -> jax.Array:
        return self.channel(rows, "wgt")

    def rows_thr(self, rows: jax.Array) -> jax.Array:
        """Per-slot neighbor noise thresholds.

        Served from the fused ``thr`` channel when packed (the hot path);
        otherwise falls back to an elementwise gather from the [N + 1]
        threshold vector (test / compat paths only — that gather is slow).
        """
        if "thr" in self.channels:
            return self.channel(rows, "thr")
        return self.threshold[self.rows_nbr(rows)]

    def rows_cdf(self, rows: jax.Array) -> jax.Array:
        return self.channel(rows, "cdf")

    def gather_rows(self, idx: jax.Array) -> jax.Array:
        """Fetch fused rows for a batch of node indices (THE hot gather)."""
        return self.fused[idx]

    # -- whole-table views (preprocessing / tests; not walk-hot) -------------

    @property
    def nbr(self) -> jax.Array:
        """[N, dpad] int32 neighbor matrix view."""
        return self.rows_nbr(self.fused)

    @property
    def wgt(self) -> jax.Array:
        """[N, dpad] float32 weight matrix view."""
        return self.rows_wgt(self.fused)


def _segment_stats(
    indptr: np.ndarray, data: np.ndarray, gamma: float
) -> np.ndarray:
    """Per-row mean + gamma * std (population std), clipped at 0.

    Matches ``SparseRWGraph.get_noise_thresholds`` (``sparse_rw.py:22-35``)
    but as one vectorized pass instead of a Python loop per node. Rows with
    no edges get threshold 0 (never consulted: walkers terminate there).
    """
    deg = np.diff(indptr).astype(np.int64)
    csum = np.concatenate([[0.0], np.cumsum(data, dtype=np.float64)])
    csum2 = np.concatenate([[0.0], np.cumsum(data.astype(np.float64) ** 2)])
    row_sum = csum[indptr[1:]] - csum[indptr[:-1]]
    row_sum2 = csum2[indptr[1:]] - csum2[indptr[:-1]]
    safe_deg = np.maximum(deg, 1)
    mean = row_sum / safe_deg
    var = np.maximum(row_sum2 / safe_deg - mean**2, 0.0)
    thresholds = mean + gamma * np.sqrt(var)
    thresholds[deg == 0] = 0.0
    return np.maximum(thresholds, 0.0).astype(np.float32)


def build_padded_host(
    indptr: np.ndarray,
    indices: np.ndarray,
    data: np.ndarray,
    gamma: float = 0.0,
    max_degree: Optional[int] = None,
):
    """Build the padded row layout as plain host numpy arrays.

    Returns (nbr [N, D] i32, wgt [N, D] f32, deg [N] i32,
    threshold [N + 1] f32, indptr [N + 1] i32) where D is the true max
    degree (or the ``max_degree`` override). Used by CPU reference code
    (tests, the benchmark baseline) that wants the padded view without a
    device transfer; ``build_device_csr`` packs these into fused rows.
    """
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int64)
    data = np.asarray(data, dtype=np.float32)
    num_nodes = indptr.size - 1
    deg = np.diff(indptr).astype(np.int32)
    width = int(deg.max()) if deg.size and deg.max() > 0 else 1
    if max_degree is not None:
        if max_degree < width:
            raise ValueError(
                f"max_degree={max_degree} is below the true max degree {width}"
            )
        width = max_degree

    nbr = np.full((num_nodes, width), num_nodes, dtype=np.int32)
    wgt = np.zeros((num_nodes, width), dtype=np.float32)
    if indices.size:
        row_of_edge = np.repeat(np.arange(num_nodes), deg)
        col_of_edge = np.arange(indices.size) - indptr[row_of_edge]
        nbr[row_of_edge, col_of_edge] = indices
        wgt[row_of_edge, col_of_edge] = data

    thresholds = np.concatenate(
        [_segment_stats(indptr, data, gamma), np.ones(1, dtype=np.float32)]
    )
    return nbr, wgt, deg, thresholds, indptr.astype(np.int32)


def pack_fused_host(channels_data) -> np.ndarray:
    """Channel-pack host [N, dpad] arrays into one [N, C * dpad] f32 table.

    Args:
        channels_data: list of (name, array) where int32 arrays are bitcast
            into the float32 row and float arrays are cast.
    """
    parts = []
    for _, arr in channels_data:
        if arr.dtype == np.int32:
            parts.append(arr.view(np.float32))
        else:
            parts.append(np.ascontiguousarray(arr, dtype=np.float32))
    return np.concatenate(parts, axis=1)


def build_device_csr(
    indptr: np.ndarray,
    indices: np.ndarray,
    data: np.ndarray,
    gamma: float = 0.0,
    max_degree: Optional[int] = None,
    with_thresholds: bool = False,
    with_cdf: bool = False,
) -> DeviceCSR:
    """Pack a host CSR triple into the fused device layout.

    Args:
        indptr: [N+1] row offsets (any integer dtype).
        indices: [E] neighbor indices, ascending within each row.
        data: [E] positive edge weights.
        gamma: node2vec+ noise-threshold std multiplier.
        max_degree: optional degree override (>= true max degree); useful to
            keep a fixed compiled shape across graphs.
        with_thresholds: add the per-neighbor noise-threshold channel
            (node2vec+ / node2vec++ modes).
        with_cdf: add the per-node first-order CDF channel (PreComp* modes).
    """
    nbr, wgt, deg, thresholds, indptr32 = build_padded_host(
        indptr, indices, data, gamma=gamma, max_degree=max_degree
    )
    num_nodes, width = nbr.shape
    dpad = _round_up(max(width, 1), LANE)

    nbr_p = np.full((num_nodes, dpad), num_nodes, dtype=np.int32)
    nbr_p[:, :width] = nbr
    wgt_p = np.zeros((num_nodes, dpad), dtype=np.float32)
    wgt_p[:, :width] = wgt

    channels_data = [("nbr", nbr_p), ("wgt", wgt_p)]
    if with_thresholds:
        thr_p = np.ones((num_nodes, dpad), dtype=np.float32)
        thr_p[:, :width] = thresholds[np.minimum(nbr, num_nodes)]
        channels_data.append(("thr", thr_p))
    if with_cdf:
        cdf = np.cumsum(wgt_p, axis=1, dtype=np.float64)
        total = np.maximum(cdf[:, -1:], 1e-30)
        cdf_p = np.minimum(cdf / total, 1.0).astype(np.float32)
        cdf_p[:, width:] = 1.0
        channels_data.append(("cdf", cdf_p))

    return DeviceCSR(
        fused=jnp.asarray(pack_fused_host(channels_data)),
        deg=jnp.asarray(deg),
        threshold=jnp.asarray(thresholds),
        indptr=jnp.asarray(indptr32),
        channels=tuple(name for name, _ in channels_data),
        dpad=dpad,
        max_degree=width,
        gamma=gamma,
    )


def device_csr_from_dense(
    dense: np.ndarray,
    gamma: float = 0.0,
    max_degree: Optional[int] = None,
    with_thresholds: bool = False,
    with_cdf: bool = False,
) -> DeviceCSR:
    """Build the fused layout from a dense adjacency matrix.

    The dense walk modes (DenseOTF / node2vec++) share the fused layout: at
    density >= 0.2 padding costs little, and one layout means one walk
    engine. Row order (ascending neighbor index) matches ``np.nonzero``.
    """
    dense = np.asarray(dense)
    rows, cols = np.nonzero(dense)
    deg = np.bincount(rows, minlength=dense.shape[0])
    indptr = np.concatenate([[0], np.cumsum(deg)])
    return build_device_csr(
        indptr,
        cols,
        dense[rows, cols],
        gamma=gamma,
        max_degree=max_degree,
        with_thresholds=with_thresholds,
        with_cdf=with_cdf,
    )
