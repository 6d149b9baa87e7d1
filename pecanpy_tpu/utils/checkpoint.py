"""SGNS training checkpoint/resume (orbax-backed).

The reference has no training checkpointing (SURVEY §5: its only
persistence is graph-format conversion and the final embedding file). For
pod-scale embedding runs, interruptible training matters, so the SGNS
trainer can periodically snapshot its full state — both embedding tables
plus the scalar training cursor — and resume mid-epoch.
"""
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except ImportError:  # pragma: no cover - orbax is in the standard image
    _HAVE_ORBAX = False


def checkpointing_available() -> bool:
    return _HAVE_ORBAX


class SGNSCheckpointer:
    """Manages a directory of numbered SGNS training snapshots."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        if not _HAVE_ORBAX:
            raise RuntimeError("orbax-checkpoint not available")
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(
        self,
        step: int,
        w_in: jax.Array,
        w_out: jax.Array,
        meta: Dict[str, Any],
    ):
        """Snapshot tables + training cursor at ``step`` (a chunk index)."""
        state = {
            "w_in": np.asarray(w_in),
            "w_out": np.asarray(w_out),
            "meta": dict(meta),
        }
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, step: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray, Dict[str, Any]]:
        """Load (w_in, w_out, meta) from ``step`` (default: latest)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        state = self._mgr.restore(step)
        return state["w_in"], state["w_out"], dict(state["meta"])

    def close(self):
        self._mgr.close()
