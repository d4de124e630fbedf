"""Hamiltonian Monte Carlo kernel (net-new vs reference; BASELINE.json).

Pure-JAX velocity-Verlet leapfrog with diagonal mass, fixed-or-jittered
trajectory length, Metropolis correction.  The kernel is a per-chain pure
function over a FLAT unconstrained position vector; chains are vmapped
(axis-named for cross-chain consensus adaptation) and sharded by
``brancher_tpu.parallel`` (SURVEY.md §7.2/§7.4).

A fused Pallas leapfrog (``brancher_tpu.ops.pallas_leapfrog``) slots in
for large state dimensions; the pure-JAX path here is the reference
implementation and the CPU/test path.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class ChainState(NamedTuple):
    z: Array  # flat unconstrained position
    pe: Array  # potential energy at z
    grad: Array  # d pe / dz


def init_chain_state(potential_fn: Callable, z: Array) -> ChainState:
    pe, grad = jax.value_and_grad(potential_fn)(z)
    return ChainState(z, pe, grad)


def kinetic_energy(r: Array, inv_mass: Array) -> Array:
    return 0.5 * jnp.sum(r * r * inv_mass)


def leapfrog(
    potential_fn: Callable,
    z: Array,
    r: Array,
    grad: Array,
    step_size: Array,
    inv_mass: Array,
    num_steps,
):
    """num_steps velocity-Verlet steps; one gradient eval per step.

    Consecutive half-kicks are fused across iterations (the cached grad
    from the previous iteration supplies the opening half-kick), matching
    the textbook integrator with L gradient evaluations.
    """

    def body(i, carry):
        z, r, pe, grad = carry
        r = r - 0.5 * step_size * grad
        z = z + step_size * inv_mass * r
        pe, grad = jax.value_and_grad(potential_fn)(z)
        r = r - 0.5 * step_size * grad
        return (z, r, pe, grad)

    pe0 = jnp.zeros((), z.dtype)
    return jax.lax.fori_loop(0, num_steps, body, (z, r, pe0, grad))


class HMC:
    """HMC kernel config (reference-style method object, SURVEY.md §2)."""

    def __init__(self, num_integration_steps: int = 32, jitter_steps: bool = True,
                 target_accept: float = 0.8, max_delta_energy: float = 1000.0):
        self.num_integration_steps = num_integration_steps
        self.jitter_steps = jitter_steps
        self.target_accept = target_accept
        self.max_delta_energy = max_delta_energy

    def make_step(self, potential_fn: Callable):
        L = self.num_integration_steps
        jitter = self.jitter_steps
        max_delta = self.max_delta_energy

        def step(key: Array, state: ChainState, step_size: Array, inv_mass: Array):
            k_mom, k_acc, k_len = jax.random.split(key, 3)
            r0 = jax.random.normal(k_mom, state.z.shape, state.z.dtype) / jnp.sqrt(inv_mass)
            h0 = state.pe + kinetic_energy(r0, inv_mass)
            n_steps = (
                jax.random.randint(k_len, (), 1, L + 1) if jitter else jnp.asarray(L)
            )
            z1, r1, pe1, grad1 = leapfrog(
                potential_fn, state.z, r0, state.grad, step_size, inv_mass, n_steps
            )
            h1 = pe1 + kinetic_energy(r1, inv_mass)
            delta = h0 - h1
            delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
            accept_prob = jnp.minimum(1.0, jnp.exp(jnp.minimum(delta, 0.0)))
            accept = jax.random.uniform(k_acc, ()) < accept_prob
            new_state = ChainState(z1, pe1, grad1)
            state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, a, b), new_state, state
            )
            stats = {
                "accept_prob": accept_prob,
                "diverging": -delta > max_delta,
                "energy": h1,
                "num_steps": n_steps.astype(jnp.int32),
            }
            return state, stats

        return step


def hmc_sample(model, **kwargs):
    """Convenience: run HMC on a ProbabilisticModel (see mcmc.sample)."""
    from .mcmc import sample

    kernel = HMC(**{k: kwargs.pop(k) for k in list(kwargs)
                    if k in ("num_integration_steps", "jitter_steps", "target_accept")})
    return sample(model, kernel=kernel, **kwargs)
