"""Global runtime configuration.

Reference parity: Brancher keeps a tiny module-level device switch in
``brancher/config.py`` (see SURVEY.md L7 / component table — the reference
mount was empty at build time, so no file:line cites are possible; claims
keyed to SURVEY.md sections instead).  The TPU rebuild keeps the same
"kwargs-first, one small config" personality but the config now describes
TPU-relevant knobs: default dtype, mesh axis names, and RNG seed policy.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class RuntimeConfig:
    """Runtime configuration for the engine.

    Attributes:
      dtype: default floating dtype for parameters and samples.  float32 is
        the TPU-native default; bfloat16 is used inside matmul-heavy kernels
        where roofline demands, never for accumulators.
      chain_axis: mesh axis name over which MCMC chains shard.
      particle_axis: mesh axis name over which SMC particles shard.
      batch_axis: mesh axis name over which SVI Monte-Carlo/data batches
        shard.
      seed: default PRNG seed used when an API is called without a key.
    """

    dtype: jnp.dtype = jnp.float32
    chain_axis: str = "chain"
    particle_axis: str = "particle"
    batch_axis: str = "batch"
    seed: int = 0
    mesh_shape: Optional[Tuple[int, ...]] = None

    def default_key(self) -> jax.Array:
        return jax.random.PRNGKey(self.seed)


# Module-level config mirrors the reference's module-level ``device`` switch.
config = RuntimeConfig()


def set_dtype(dtype) -> None:
    config.dtype = jnp.dtype(dtype)


def default_dtype() -> jnp.dtype:
    return config.dtype


def enable_nan_checks(on: bool = True) -> None:
    """Debug aid (SURVEY.md §5 "Race detection": pure-JAX code needs no
    sanitizers; NaN provenance is the analogous failure mode).  Turns on
    jax_debug_nans so the first NaN-producing primitive raises with a
    traceback into the model."""
    jax.config.update("jax_debug_nans", on)
