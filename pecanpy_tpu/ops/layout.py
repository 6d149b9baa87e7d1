"""Padded-CSR device layout for TPU walk kernels.

The reference walks a scalar CSR one node at a time (Numba closures over
``indptr``/``indices``/``data``, ``src/pecanpy/rw/sparse_rw.py:133-139``).
On TPU the equivalent structure is a *padded row matrix*: every node's
neighbor list occupies one fixed-width row, so a batch of B walkers gathers
its B current rows with a single ``take`` — static shapes, fully vectorized,
XLA-friendly.

Layout invariants (the transition kernels rely on all of these):

* ``nbr[i, :deg[i]]`` lists node i's neighbors in **ascending order** (same
  sorted-row invariant as the reference CSR, ``graph.py:323-341``).
* Rows are padded with the sentinel value ``num_nodes`` — strictly greater
  than any real node index, so padded rows stay sorted and the sentinel can
  never collide with a real neighbor during membership tests.
* ``wgt`` is 0 at padded positions, so padded entries carry zero probability
  through every bias/normalization path without extra masking.
* ``threshold`` has ``num_nodes + 1`` entries so it can be gathered by
  (possibly sentinel-valued) neighbor indices; the sentinel slot is 1.0 to
  keep divisions finite.

Degree skew note: padding to the max degree is wasteful on power-law graphs
(the same reason the reference splits PreComp/SparseOTF/DenseOTF modes). A
degree-bucketed layout is the planned optimization; this module keeps the
layout abstraction boundary so the walk engine does not care.
"""
import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceCSR:
    """Padded CSR neighbor table resident on device.

    Attributes:
        nbr: [N, D] int32 neighbor indices, ascending per row, padded with N.
        wgt: [N, D] float32 edge weights, 0.0 at padded slots.
        deg: [N] int32 true degree of each node.
        threshold: [N + 1] float32 node2vec+ noise thresholds
            (mean + gamma * std of each node's edge weights, clipped at 0;
            reference: ``sparse_rw.py:22-35``). Sentinel slot = 1.0.
        indptr: [N + 1] int32 row offsets of the *flat* CSR — kept for the
            PreComp alias-table addressing scheme (edge id = indptr[cur] +
            local neighbor position, ``pecanpy.py:426-436``).
    """

    nbr: jax.Array
    wgt: jax.Array
    deg: jax.Array
    threshold: jax.Array
    indptr: jax.Array

    @property
    def num_nodes(self) -> int:
        return self.nbr.shape[0]

    @property
    def max_degree(self) -> int:
        return self.nbr.shape[1]


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
    """Build the padded row layout as host numpy arrays.

    Returns (nbr, wgt, deg, threshold, indptr) with the same invariants as
    ``DeviceCSR``. Used by ``build_device_csr`` and by CPU reference code
    (e.g. the benchmark baseline) that needs the layout without a device
    transfer.
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


def build_device_csr(
    indptr: np.ndarray,
    indices: np.ndarray,
    data: np.ndarray,
    gamma: float = 0.0,
    max_degree: Optional[int] = None,
) -> DeviceCSR:
    """Pack a host CSR triple into the padded device layout.

    Args:
        indptr: [N+1] row offsets (any integer dtype).
        indices: [E] neighbor indices, ascending within each row.
        data: [E] positive edge weights.
        gamma: node2vec+ noise-threshold std multiplier.
        max_degree: optional row width override (>= true max degree); useful
            to keep a fixed compiled shape across graphs.
    """
    nbr, wgt, deg, thresholds, indptr32 = build_padded_host(
        indptr, indices, data, gamma=gamma, max_degree=max_degree
    )
    return DeviceCSR(
        nbr=jnp.asarray(nbr),
        wgt=jnp.asarray(wgt),
        deg=jnp.asarray(deg),
        threshold=jnp.asarray(thresholds),
        indptr=jnp.asarray(indptr32),
    )


def device_csr_from_dense(
    dense: np.ndarray, gamma: float = 0.0, max_degree: Optional[int] = None
) -> DeviceCSR:
    """Build the padded layout from a dense adjacency matrix.

    The dense walk modes (DenseOTF / node2vec++) share the padded layout:
    at density >= 0.2 padding costs little, and one layout means one walk
    engine. Row order (ascending neighbor index) matches ``np.nonzero``.
    """
    dense = np.asarray(dense)
    rows, cols = np.nonzero(dense)
    deg = np.bincount(rows, minlength=dense.shape[0])
    indptr = np.concatenate([[0], np.cumsum(deg)])
    return build_device_csr(
        indptr, cols, dense[rows, cols], gamma=gamma, max_degree=max_degree
    )
