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


def verify_rng_scheme(meta: Dict[str, Any], expected: str) -> None:
    """Refuse to resume across an RNG-stream derivation change.

    Each trainer stamps its checkpoints with the version tag of its key
    derivation (walk keys, per-step fold_ins, split structure). Resuming
    a checkpoint written under a different scheme would silently
    continue training on a DIFFERENT corpus/schedule than the run that
    wrote it — the resume would "work" and produce subtly wrong
    trajectories, so mismatch (or a pre-versioning checkpoint) is a hard
    error rather than a warning.
    """
    found = meta.get("rng_scheme")
    if found != expected:
        raise ValueError(
            f"checkpoint was written under RNG scheme {found!r} but this "
            f"trainer derives its streams under {expected!r}; resuming "
            "would train on a different corpus/schedule than the "
            "original run. Start fresh (delete or relocate the "
            "checkpoint directory), or rerun with the matching package "
            "version."
        )


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
        """Snapshot tables + training cursor at ``step`` (a chunk index).

        String meta values (e.g. the ``rng_scheme`` version tag) encode
        as uint8 arrays — orbax's standard handler stores arrays only —
        and decode back transparently in ``restore``.
        """
        state = {
            "w_in": np.asarray(w_in),
            "w_out": np.asarray(w_out),
            "meta": {
                k: (
                    np.frombuffer(v.encode("utf-8"), dtype=np.uint8).copy()
                    if isinstance(v, str)
                    else v
                )
                for k, v in meta.items()
            },
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
        meta = {
            k: (
                np.asarray(v).tobytes().decode("utf-8")
                if isinstance(v, np.ndarray) and v.dtype == np.uint8
                else v
            )
            for k, v in dict(state["meta"]).items()
        }
        return state["w_in"], state["w_out"], meta

    def close(self):
        self._mgr.close()
