"""Checkpoint / resume for field-construction training.

Parity target: the reference's capture/restore tuples
(gaussian_model.capture:90-134, restore:136-191 — splat params + both
optimizer states + learnable poses + densify stats + iteration) saved via
torch.save at checkpoint_iterations (gaussian_field.py:545-549), plus the
AppModel weights (scene/app_model.py:19-32) and PLY snapshots at
save_iterations (scene/__init__.py:138-146).

Implemented with orbax (standard JAX checkpointing): the whole TrainState
pytree round-trips in one call; PLY snapshots are written separately for
reference interchange (scene/ply_io.py).
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from .field import TrainState


def save_checkpoint(path: str, state: Any, iteration: int) -> None:
    """Works for any pytree: the field TrainState, the DiT fine-tune
    state (train/dit.py dicts incl. optimizer state), or LoRA adapter
    trees (train/lora.py)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, f"chkpnt{iteration}"), state, force=True)
    ckptr.wait_until_finished()


def latest_iteration(path: str) -> Optional[int]:
    """searchForMaxIteration (app_model.py:7-9) over chkpnt* dirs."""
    if not os.path.isdir(path):
        return None
    its = [int(d[len("chkpnt"):]) for d in os.listdir(path)
           if d.startswith("chkpnt") and d[len("chkpnt"):].isdigit()]
    return max(its) if its else None


def restore_checkpoint(path: str, template: Any,
                       iteration: Optional[int] = None
                       ) -> Tuple[Any, int]:
    path = os.path.abspath(path)
    it = iteration if iteration is not None else latest_iteration(path)
    if it is None:
        raise FileNotFoundError(f"no checkpoints under {path}")
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, 'shape') else x, template)
    state = ckptr.restore(os.path.join(path, f"chkpnt{it}"), abstract)
    return state, it
