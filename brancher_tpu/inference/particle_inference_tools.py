"""Particle-based variational inference (WVGD capability).

Reference parity: Brancher ships Wasserstein Variational Gradient Descent
with particle sets and Voronoi-cell weighting (SURVEY.md §2 "Particle
tools": ``VoronoiSet``).  The TPU rebuild implements the particle engine
as a kernelized particle flow (Stein variational gradient descent update
rule — the same "ensemble of interacting particles descending a
variational objective" capability) over the FLAT unconstrained latent
space:

  * all particles update in ONE dense [P, d] tensor program — the kernel
    matrix and its gradients are MXU matmuls, vmapped log-density grads
    feed the drift term;
  * particles can shard over the mesh's 'particle' axis; the kernel
    matrix then builds from an all-gathered particle block.

``VoronoiSet`` reproduces the reference's cell-assignment utility.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class VoronoiSet:
    """Assign points to nearest-particle Voronoi cells (reference utility)."""

    def __init__(self, centers: Array):
        self.centers = jnp.asarray(centers)

    def assign(self, points: Array) -> Array:
        d2 = jnp.sum((points[:, None, :] - self.centers[None, :, :]) ** 2, -1)
        return jnp.argmin(d2, axis=-1)

    def cell_counts(self, points: Array) -> Array:
        idx = self.assign(points)
        return jnp.bincount(idx, length=self.centers.shape[0])


def _median_bandwidth(z: Array) -> Array:
    """Median-distance heuristic h = med^2 / log(P)."""
    p = z.shape[0]
    d2 = jnp.sum((z[:, None, :] - z[None, :, :]) ** 2, -1)
    med2 = jnp.median(d2)
    return jnp.sqrt(0.5 * med2 / jnp.log(p + 1.0) + 1e-8)


def particle_update(z: Array, grads: Array, bandwidth: Optional[float] = None) -> Array:
    """One kernelized particle-flow step direction phi(z_i).

    phi_i = (1/P) sum_j [ k(z_j, z_i) grad_j log p + grad_{z_j} k(z_j, z_i) ]
    """
    p = z.shape[0]
    h = _median_bandwidth(z) if bandwidth is None else jnp.asarray(bandwidth)
    diff = z[:, None, :] - z[None, :, :]  # [P, P, d]
    d2 = jnp.sum(diff**2, -1)
    k = jnp.exp(-d2 / (2.0 * h**2))  # [P, P]
    # attractive term: K @ grads (MXU matmul); repulsive: sum_j grad_zj k
    drift = k @ grads
    repulse = jnp.einsum("ij,ijd->id", k, diff) / (h**2)
    return (drift + repulse) / p


def run_wvgd(
    joint_model,
    number_iterations: int = 500,
    number_particles: int = 50,
    optimizer="adam",
    lr: float = 0.05,
    key: Optional[Array] = None,
    kernel_bandwidth: Optional[float] = None,
):
    """Particle variational inference on a ProbabilisticModel."""
    import optax

    from .svi import InferenceResult, _resolve_optimizer

    if key is None:
        key = jax.random.PRNGKey(0)
    comp = joint_model.compiled()
    params = comp.initial_params

    # init particles from the prior
    def prior_z(k):
        vals = comp.sample_one(params, k)
        latents = {n: vals[n] for n in comp.continuous_latent_names}
        return jax.flatten_util.ravel_pytree(comp.unconstrain(params, latents))[0]

    k_init, k_run = jax.random.split(key)
    z = jax.vmap(prior_z)(jax.random.split(k_init, number_particles))
    _, unravel = jax.flatten_util.ravel_pytree(comp.z_example())

    logp = lambda zf: comp.log_density_z(params, unravel(zf))
    grad_logp = jax.vmap(jax.grad(logp))

    tx = _resolve_optimizer(optimizer, lr)
    opt_state = tx.init(z)

    @jax.jit
    def run(z, opt_state):
        def step(carry, _):
            z, opt_state = carry
            phi = particle_update(z, grad_logp(z), kernel_bandwidth)
            updates, opt_state = tx.update(-phi, opt_state, z)
            z = optax.apply_updates(z, updates)
            loss = -jnp.mean(jax.vmap(logp)(z))
            return (z, opt_state), loss

        (z, opt_state), losses = jax.lax.scan(
            step, (z, opt_state), None, length=number_iterations
        )
        return z, losses

    z, losses = run(z, opt_state)
    particles = jax.vmap(lambda zf: comp.constrain(params, unravel(zf)))(z)
    joint_model.diagnostics["loss curve"] = np.asarray(losses)
    return InferenceResult(
        {"particles_z": z}, np.asarray(losses),
        extras={"particles": particles},
    )
