"""Shared type aliases.

Parity with the reference type vocabulary (``src/pecanpy/typing.py:19-31``)
without the nptyping dependency: plain numpy/jax array aliases.
"""
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

# Host-side array aliases ----------------------------------------------------
Uint32Array = np.ndarray  # dtype uint32
Uint64Array = np.ndarray  # dtype uint64
Float32Array = np.ndarray  # dtype float32
AdjMat = np.ndarray  # 2-D float adjacency matrix
AdjNonZeroMat = np.ndarray  # 2-D bool nonzero mask

# CSR triple: (indptr uint32, indices uint32, data float32)
CSR = Tuple[Uint32Array, Uint32Array, Float32Array]

# Final embedding matrix: float32, shape [num_nodes, dim]
Embeddings = np.ndarray

# Device-side: any jax.Array
JaxArray = Any

# Walk-callback aliases (reference: ``src/pecanpy/typing.py:19-21``).
# ``Base.get_has_nbrs`` / ``Base.get_move_forward`` return these shapes;
# the batch engine itself never uses scalar callbacks.
HasNbrs = Callable[[int], bool]
MoveForward = Callable[..., int]

__all__ = [
    "HasNbrs",
    "MoveForward",
    "Any",
    "Callable",
    "Dict",
    "Iterator",
    "List",
    "Optional",
    "Sequence",
    "Tuple",
    "Uint32Array",
    "Uint64Array",
    "Float32Array",
    "AdjMat",
    "AdjNonZeroMat",
    "CSR",
    "Embeddings",
    "JaxArray",
]
