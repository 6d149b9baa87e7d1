"""Walk-mode model classes and the SGNS embedding trainer."""

from pecanpy_tpu.models.base import Base  # noqa: F401
from pecanpy_tpu.models.modes import (  # noqa: F401
    DenseOTF,
    FirstOrderUnweighted,
    PreComp,
    PreCompFirstOrder,
    SparseOTF,
)
