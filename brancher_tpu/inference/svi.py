"""Stochastic variational inference + point estimation.

Reference parity: Brancher's ``inference.perform_inference`` training loop
and inference-method classes — ``ReverseKL`` (ELBO), ``MaximumLikelihood``
/ ``MAP``, ``WassersteinVariationalGradientDescent`` (SURVEY.md §2
"Inference driver", §3.4, §3.5).

TPU-first redesign (BASELINE.json: "autograd ELBO → jax.grad with sharded
Monte-Carlo batches"): the reference's N-iteration Python loop with two
full graph traversals + torch autograd per step becomes ONE jitted
``lax.scan`` over steps; each step vmaps the S-sample Monte-Carlo batch
and takes an optax update of all parameters (guide params, learnable model
params, flax modules).  The MC batch dimension can shard over a mesh axis
('batch') — the ELBO mean then reduces with psum over ICI
(see ``parallel`` and ``dryrun_multichip``).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..compiler import CompiledModel
from .gradient_estimators import (
    BlackBoxEstimator,
    GradientEstimator,
    PathwiseDerivativeEstimator,
    Taylor1Estimator,
)
from .guides import AutoMeanField, DSLGuide

Array = jax.Array


def _resolve_optimizer(optimizer, lr):
    import optax

    if isinstance(optimizer, str):
        name = optimizer.lower()
        table = {
            "adam": optax.adam,
            "adamw": optax.adamw,
            "sgd": optax.sgd,
            "rmsprop": optax.rmsprop,
            "adagrad": optax.adagrad,
        }
        if name not in table:
            raise ValueError(f"unknown optimizer {optimizer!r}")
        return table[name](lr)
    if callable(optimizer) and not hasattr(optimizer, "update"):
        return optimizer(lr)
    return optimizer  # assume an optax GradientTransformation


class InferenceMethod:
    """Base class for inference-method strategy objects."""

    def make_loss(self, p_comp: CompiledModel, guide) -> Callable:
        raise NotImplementedError


class ReverseKL(InferenceMethod):
    """Negative-ELBO minimization (the reference's default method).

    enumerate_discrete: with an unconstrained-space (auto) guide, sum out
    Bernoulli/Categorical latents exactly inside log p (compiler
    enumeration) instead of requiring the guide to sample them.
    """

    def __init__(self, gradient_estimator: Optional[GradientEstimator] = None,
                 enumerate_discrete: bool = False):
        self.estimator = gradient_estimator or PathwiseDerivativeEstimator()
        self.enumerate_discrete = enumerate_discrete

    def make_loss(self, p_comp: CompiledModel, guide):
        est = self.estimator
        latent_set = set(p_comp.latent_names)
        loaders = tuple(p_comp.data_loader_names)
        enum = self.enumerate_discrete
        enum_density = None
        if enum:
            # same dispatch as mcmc.sample(enumerate_discrete=True):
            # element-wise logsumexp / structural-chain forward algorithm
            # / general variable elimination (compiler.enum_log_density_fn
            # caches the verdict per compiled model)
            enum_density = p_comp.enum_log_density_fn(p_comp.initial_params)

        def loss_fn(opt_params, key, num_samples: int):
            p_params, q_params = opt_params["p"], opt_params["q"]
            k_data, k_guide = jax.random.split(key)
            given_data = (
                p_comp.sample_subgraph_one(p_params, k_data, loaders) if loaders else {}
            )
            values, log_q = guide.sample_and_log_prob(
                q_params, k_guide, num_samples,
                detach=est.detach_samples, deterministic=est.deterministic,
                given=given_data,
            )
            if guide.space == "constrained":
                latents = {k: v for k, v in values.items() if k in latent_set}
                log_p = jax.vmap(
                    lambda s: p_comp.log_prob_one(p_params, {**s, **given_data})
                )(latents)
            elif enum:
                log_p = jax.vmap(
                    lambda z: enum_density(p_params, z, given_data)
                )(values)
            else:
                log_p = jax.vmap(
                    lambda z: p_comp.log_density_z(p_params, z, given_data)
                )(values)
            return est.surrogate_loss(log_p, log_q)

        return loss_fn


class MaximumLikelihood(InferenceMethod):
    """Maximize the observed-data log-likelihood over learnable params;
    latent RVs (if any) are marginalized by prior Monte-Carlo."""

    def make_loss(self, p_comp: CompiledModel, guide):
        observed = set(p_comp.observed_names)

        def loss_fn(opt_params, key, num_samples: int):
            p_params = opt_params["p"]

            def one(k):
                values, _ = p_comp._walk_sample(p_comp._as_store(p_params), k, {})
                # evaluate the likelihood at the OBSERVED data (drop the
                # prior-predictive draws of observed variables)
                latents = {k2: v for k2, v in values.items() if k2 not in observed}
                return p_comp.log_likelihood_one(p_params, latents)

            keys = jax.random.split(key, num_samples)
            return -jnp.mean(jax.vmap(one)(keys))

        return loss_fn


class MAP(InferenceMethod):
    """Joint MAP: optimize the unconstrained latent point z together with
    learnable params; loss = -log p(z, data) including Jacobian."""

    def make_loss(self, p_comp: CompiledModel, guide):
        loaders = tuple(p_comp.data_loader_names)

        def loss_fn(opt_params, key, num_samples: int):
            p_params = opt_params["p"]
            z = opt_params["z"]
            given_data = (
                p_comp.sample_subgraph_one(p_params, key, loaders) if loaders else {}
            )
            return -p_comp.log_density_z(p_params, z, given_data)

        return loss_fn


class WassersteinVariationalGradientDescent(InferenceMethod):
    """Wasserstein VGD proper (reference's WVGD capability; SURVEY.md §2
    "Particle tools"): semi-discrete optimal-transport particle descent
    of W2(posterior, ensemble).  ``method="sinkhorn"`` (default) uses an
    entropic transport plan; ``method="exact"`` uses Laguerre-cell dual
    ascent with rate ``psi_lr``.  See ``particle_inference_tools.run_wvgd``
    for the algorithm."""

    def __init__(self, number_particles: int = 50, number_samples: int = 512,
                 proposal_scale: float = 1.0, psi_lr: float = 1.0,
                 step_size: float = 0.5, method: str = "sinkhorn"):
        self.number_particles = number_particles
        self.number_samples = number_samples
        self.proposal_scale = proposal_scale
        self.psi_lr = psi_lr
        self.step_size = step_size
        self.method = method


class SteinVariationalGradientDescent(InferenceMethod):
    """Kernelized particle flow (SVGD update rule) — the round-1 particle
    engine, kept as its own method (distinct from true WVGD)."""

    def __init__(self, number_particles: int = 50, kernel_bandwidth: Optional[float] = None):
        self.number_particles = number_particles
        self.kernel_bandwidth = kernel_bandwidth


class InferenceResult:
    def __init__(self, params, loss_curve, guide=None, extras=None):
        self.params = params
        self.loss_curve = loss_curve
        self.guide = guide
        self.extras = extras or {}

    def __repr__(self):
        final = float(self.loss_curve[-1]) if len(self.loss_curve) else float("nan")
        return f"<InferenceResult iterations={len(self.loss_curve)} final_loss={final:.4f}>"


def perform_inference(
    joint_model,
    number_iterations: int = 1000,
    number_samples: int = 10,
    optimizer: Any = "adam",
    lr: float = 0.01,
    inference_method: Optional[InferenceMethod] = None,
    posterior_model=None,
    guide=None,
    key: Optional[Array] = None,
    params_init: Optional[Dict[str, Any]] = None,
    mesh=None,
    batch_axis: str = "batch",
    progress: bool = False,
    progress_interval: int = 100,
    matmul_precision: Optional[str] = None,
    scan_unroll: int = 1,
) -> InferenceResult:
    """Run SVI / point estimation (reference entry point, SURVEY.md §3.4).

    The guide is chosen by precedence: explicit ``guide`` arg > DSL
    ``posterior_model`` (or one attached via ``set_posterior_model``) >
    automatic mean-field in unconstrained space.

    With ``mesh``: the Monte-Carlo sample batch (and any minibatch draw)
    splits across the mesh's ``batch_axis``; each device evaluates its
    S/n_dev-sample ELBO shard and the mean reduces with ``pmean`` (psum
    over ICI) — BASELINE.json's "sharded Monte-Carlo batches".
    Gradients flow through shard_map, so the optimizer step stays global.

    matmul_precision: e.g. "bfloat16" runs every matmul in the loss
    (guide MLPs, decoder, log-densities) at reduced precision on the MXU
    while parameters and the optimizer stay f32 — the standard TPU
    mixed-precision recipe (ROADMAP r2 #5).  None keeps the backend
    default ("highest" on this chip).

    scan_unroll: unroll factor for the training-step lax.scan.  Small
    per-step programs (e.g. the B=256/h=64 bench VAE at ~70 us/step)
    are bound by per-iteration loop/launch overhead, not compute;
    unrolling amortizes it — though only by ~9% at the bench shape,
    whose cost is per-KERNEL launch latency inside the step body
    (measured on-chip: scripts/exp_elbo_unroll.py, BASELINE.md "ELBO
    step cost" note).  Non-divisible number_iterations runs an unrolled
    main scan plus a rolled remainder — exactly number_iterations
    optimizer steps either way.
    """
    import optax

    if inference_method is None:
        inference_method = ReverseKL()
    if key is None:
        from ..config import config

        key = jax.random.PRNGKey(config.seed)

    if isinstance(inference_method, WassersteinVariationalGradientDescent):
        from .particle_inference_tools import run_wvgd

        return run_wvgd(
            joint_model,
            number_iterations=number_iterations,
            number_particles=inference_method.number_particles,
            lr=inference_method.step_size,
            key=key,
            number_samples=inference_method.number_samples,
            proposal_scale=inference_method.proposal_scale,
            psi_lr=inference_method.psi_lr,
            method=inference_method.method,
        )
    if isinstance(inference_method, SteinVariationalGradientDescent):
        from .particle_inference_tools import run_svgd

        return run_svgd(
            joint_model,
            number_iterations=number_iterations,
            number_particles=inference_method.number_particles,
            optimizer=optimizer,
            lr=lr,
            key=key,
            kernel_bandwidth=inference_method.kernel_bandwidth,
        )

    p_comp: CompiledModel = joint_model.compiled()

    if guide is None:
        q_model = posterior_model or getattr(joint_model, "posterior_model", None)
        if q_model is not None:
            guide = DSLGuide(q_model)
        elif isinstance(inference_method, (MaximumLikelihood, MAP)):
            guide = None
        else:
            guide = AutoMeanField(p_comp)

    k_init, k_run = jax.random.split(key)
    opt_params: Dict[str, Any] = {"p": dict(p_comp.initial_params)}
    if guide is not None:
        opt_params["q"] = guide.init_params(k_init)
    if isinstance(inference_method, MAP):
        opt_params["z"] = p_comp.z_example()
    if params_init:
        opt_params.update(params_init)

    base_loss_fn = inference_method.make_loss(p_comp, guide)
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        n_dev = mesh.shape[batch_axis]
        if number_samples % n_dev != 0:
            raise ValueError(
                f"number_samples={number_samples} must divide over mesh "
                f"axis {batch_axis!r} of size {n_dev}"
            )
        local_s = number_samples // n_dev

        def loss_fn(p, key, num_samples):
            keys = jax.random.split(key, n_dev)

            def body(keys_shard):
                l = base_loss_fn(p, keys_shard[0], local_s)
                return jax.lax.pmean(l, batch_axis)

            return shard_map(
                body, mesh=mesh, in_specs=(P(batch_axis),), out_specs=P(),
                check_vma=False,
            )(keys)

    else:
        loss_fn = base_loss_fn
    tx = _resolve_optimizer(optimizer, lr)
    opt_state = tx.init(opt_params)

    def _report(step_idx, loss):
        print(f"[perform_inference] step {int(step_idx)}: loss {float(loss):.4f}",
              flush=True)

    @jax.jit
    def run(opt_params, opt_state, key):
        def step(carry, xs):
            opt_params, opt_state = carry
            k, i = xs

            def loss_at(p):
                if matmul_precision is None:
                    return loss_fn(p, k, number_samples)
                with jax.default_matmul_precision(matmul_precision):
                    return loss_fn(p, k, number_samples)

            loss, grads = jax.value_and_grad(loss_at)(opt_params)
            updates, opt_state = tx.update(grads, opt_state, opt_params)
            opt_params = optax.apply_updates(opt_params, updates)
            if progress:
                jax.lax.cond(
                    i % progress_interval == 0,
                    lambda: jax.debug.callback(_report, i, loss),
                    lambda: None,
                )
            return (opt_params, opt_state), loss

        keys = jax.random.split(key, number_iterations)
        steps = jnp.arange(number_iterations)
        if scan_unroll > 1 and number_iterations % scan_unroll:
            # exact semantics for non-divisible counts: an unrolled main
            # scan plus a rolled remainder (rounding UP would run extra
            # optimizer steps and silently return different params)
            n_main = (number_iterations // scan_unroll) * scan_unroll
            carry = (opt_params, opt_state)
            losses_parts = []
            if n_main:
                carry, l_main = jax.lax.scan(
                    step, carry, (keys[:n_main], steps[:n_main]),
                    unroll=scan_unroll,
                )
                losses_parts.append(l_main)
            carry, l_rest = jax.lax.scan(
                step, carry, (keys[n_main:], steps[n_main:])
            )
            losses_parts.append(l_rest)
            (opt_params, opt_state) = carry
            losses = jnp.concatenate(losses_parts)
        else:
            (opt_params, opt_state), losses = jax.lax.scan(
                step, (opt_params, opt_state), (keys, steps),
                unroll=scan_unroll,
            )
        return opt_params, losses

    import time as _time

    opt_params_out, losses = run(opt_params, opt_state, k_run)
    if getattr(perform_inference, "_benchmark", False):
        # time re-executions of the SAME compiled program; keep the best
        # of 3 (each is one device-atomic launch, so the min filters any
        # queueing delay from concurrent bench children)
        jax.block_until_ready(losses)
        best = float("inf")
        for _ in range(3):
            t0 = _time.time()
            opt_params_out, losses = run(opt_params, opt_state, k_run)
            jax.block_until_ready(losses)
            best = min(best, _time.time() - t0)
        perform_inference._last_run_seconds = best
    opt_params = opt_params_out

    # reference behaviour: record the loss curve on the model
    joint_model.diagnostics["loss curve"] = np.asarray(losses)

    extras = {}
    if isinstance(inference_method, MAP):
        extras["map_point"] = p_comp.constrain(opt_params["p"], opt_params["z"])
    # push trained q params back onto attached posterior model for
    # get_posterior_sample parity
    if guide is not None and isinstance(guide, DSLGuide):
        guide.comp.initial_params = opt_params["q"]
        joint_model._trained_params = opt_params
    return InferenceResult(opt_params, np.asarray(losses), guide=guide, extras=extras)
