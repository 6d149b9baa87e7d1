"""Experimental features: node2vec++ continuous bias walks.

Reference: ``src/pecanpy/experimental.py:8-102``. Node2vecPlusPlus smooths
the discontinuity of the node2vec+ bias factor by interpolating alpha as a
continuous function of both w(cur, x) and w(prev, x); dense-container only
in the reference, same here for parity (the device layout is shared).
"""
from pecanpy_tpu.models.base import Base  # noqa: F401
from pecanpy_tpu.models.experimental import Node2vecPlusPlus  # noqa: F401

__all__ = ["Node2vecPlusPlus"]
