"""Orbax checkpoint/resume for long-running inference.

No reference counterpart (SURVEY.md §5 "Checkpoint / resume": Brancher
keeps losses in an in-memory dict and users pickle by hand).  The rebuild
checkpoints (a) SVI: guide/model params + optax state, (b) MCMC: chain
positions + step size + mass matrix + RNG keys, (c) SMC: particle states
and weights — so pod jobs restart from a checkpoint after preemption
(the failure-recovery story, SURVEY.md §5 "Failure detection").
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _manager(path: str):
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(path: str, state: Any) -> None:
    """Save any pytree of arrays to ``path`` (an empty/new directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree saved by save_checkpoint.  ``template`` (a pytree
    of like-shaped arrays) guides dtype/sharding restoration."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        target = jax.tree_util.tree_map(np.asarray, template)
        return ckptr.restore(path, target)
    return ckptr.restore(path)


class CheckpointableState(dict):
    """Thin dict wrapper marking inference states meant for checkpointing:

    * SVI: {"params": ..., "opt_state": ..., "step": ...}
    * MCMC: {"z": ..., "step_size": ..., "inv_mass": ..., "key": ...}
    * SMC: {"particles": ..., "log_weights": ..., "t": ...}
    """
