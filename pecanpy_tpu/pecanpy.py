"""Mode classes under the reference module path.

The reference exposes its walk modes as ``pecanpy.pecanpy.<Mode>``
(``src/pecanpy/pecanpy.py``); this module provides the same import surface:

    >>> from pecanpy_tpu import pecanpy
    >>> g = pecanpy.PreComp(p=0.5, q=1)
"""

from pecanpy_tpu.models.base import Base  # noqa: F401
from pecanpy_tpu.models.modes import (  # noqa: F401
    DenseOTF,
    FirstOrderUnweighted,
    PreComp,
    PreCompFirstOrder,
    SparseOTF,
)

__all__ = [
    "Base",
    "DenseOTF",
    "FirstOrderUnweighted",
    "PreComp",
    "PreCompFirstOrder",
    "SparseOTF",
]
