"""Mesh construction and sharding helpers.

No reference counterpart: Brancher has no distributed backend (SURVEY.md
§2: no NCCL/MPI/Gloo).  The rebuild's communication layer is JAX-native
(BASELINE.json): ``jax.distributed.initialize`` for multi-host bring-up,
one ``jax.sharding.Mesh`` whose axes name the parallelism domains
(chains / particles / MC-batch), ``NamedSharding`` for placement, and
axis-name collectives (psum / all_gather / ppermute) that lower to ICI
within a slice and DCN across slices.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import config


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up.  No-op when already initialized or single-host
    (the common CI/dev case); on a pod slice the standard env-var
    auto-detection applies when args are omitted."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def make_mesh(
    axes: Dict[str, int],
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh from {axis_name: size}.  Size -1 absorbs remaining
    devices.  Axis order follows dict order (outermost first) — put the
    DCN-crossing axis (hosts) first, ICI axes after."""
    devices = list(devices if devices is not None else jax.devices())
    sizes = dict(axes)
    known = int(np.prod([s for s in sizes.values() if s != -1]))
    for k, s in sizes.items():
        if s == -1:
            sizes[k] = len(devices) // known
    total = int(np.prod(list(sizes.values())))
    if total > len(devices):
        raise ValueError(f"mesh {sizes} needs {total} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:total]).reshape(tuple(sizes.values()))
    return Mesh(dev_array, tuple(sizes.keys()))


def chain_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the chain axis (NUTS/HMC chain parallelism)."""
    devs = jax.devices() if num_devices is None else jax.devices()[:num_devices]
    return make_mesh({config.chain_axis: len(devs)}, devs)


def particle_mesh(num_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices() if num_devices is None else jax.devices()[:num_devices]
    return make_mesh({config.particle_axis: len(devs)}, devs)


def batch_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the Monte-Carlo/data batch axis (SVI)."""
    devs = jax.devices() if num_devices is None else jax.devices()[:num_devices]
    return make_mesh({config.batch_axis: len(devs)}, devs)


def shard_leading_axis(x, mesh: Mesh, axis_name: str):
    """Place an array (or pytree) with its leading axis sharded over
    ``axis_name`` and the rest replicated."""
    def put(a):
        spec = P(axis_name, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, x)
