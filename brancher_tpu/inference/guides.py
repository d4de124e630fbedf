"""Variational guides (posterior families) for SVI.

Reference parity: in Brancher the user BUILDS the variational model with
the same DSL and attaches it via ``set_posterior_model`` (SURVEY.md §3.4)
— that path is ``DSLGuide``.  The rebuild additionally provides automatic
guides required by BASELINE.json ("mean-field and autoregressive-guide
SVI"): ``AutoMeanField`` (diagonal Normal in unconstrained space),
``AutoFullRankNormal``, and ``AutoIAF`` (inverse-autoregressive-flow
guide built from MADE-masked dense layers — MXU-friendly matmuls).

Guide protocol (consumed by the ELBO engine):
  * ``space``: "constrained" (values keyed by latent name) or
    "unconstrained" (z-space; the engine pairs it with log_density_z).
  * ``init_params(key)``
  * ``sample_and_log_prob(params, key, n, detach, deterministic)``
      -> (values dict with leading sample axis, log_q[n])
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from ..compiler import CompiledModel

Array = jax.Array


class DSLGuide:
    """Adapter: a user-built ProbabilisticModel as variational family.

    Sampling happens in CONSTRAINED space; log q is the guide model's own
    log-joint of its sampled values.  Latent correspondence with the
    target model is by variable name (reference semantics).
    """

    space = "constrained"

    def __init__(self, q_model):
        self.q_model = q_model
        self.comp: CompiledModel = q_model.compiled()

    def init_params(self, key):
        return self.comp.initial_params

    def sample_and_log_prob(self, params, key, n, detach=False, deterministic=False,
                            given=None):
        comp = self.comp
        names = set(comp.names)
        g = {k: v for k, v in (given or {}).items() if k in names}

        def one(k):
            store = comp._as_store(params)
            if deterministic:
                values = comp._walk_mean(store, g)
                logq = comp._walk_log_prob(store, values)
                return values, logq
            values, logq = comp._walk_sample(store, k, g)
            return values, logq

        keys = jax.random.split(key, n)
        values, logq = jax.vmap(one)(keys)
        if detach:
            values = jax.lax.stop_gradient(values)
            # recompute log q differentiably in params: pass only the
            # RANDOM variables' values — deterministic nodes (learnable
            # leaves!) must be re-derived from params, not read from the
            # detached dict, or the score-function gradient is zero
            rv_names = set(comp.latent_names) | set(comp.observed_names)
            rv_values = {k: v for k, v in values.items() if k in rv_names}
            logq = comp.log_prob(params, rv_values)
        return values, logq


class AutoMeanField:
    """Diagonal Normal over the flat unconstrained latent vector."""

    space = "unconstrained"

    def __init__(self, comp: CompiledModel, init_scale: float = 0.1):
        self.comp = comp
        z0, self.unravel = jax.flatten_util.ravel_pytree(comp.z_example())
        self.dim = z0.shape[0]
        self.init_scale = init_scale

    def init_params(self, key):
        loc = 0.01 * jax.random.normal(key, (self.dim,))
        return {"loc": loc, "log_scale": jnp.full((self.dim,), np.log(self.init_scale), loc.dtype)}

    def _sample_flat(self, params, k, deterministic):
        eps = jnp.where(deterministic, 0.0, 1.0) * jax.random.normal(k, (self.dim,))
        scale = jnp.exp(params["log_scale"])
        z = params["loc"] + scale * eps
        logq = jnp.sum(
            -0.5 * eps**2 - 0.5 * jnp.log(2 * jnp.pi) - params["log_scale"]
        )
        return z, logq

    def sample_and_log_prob(self, params, key, n, detach=False, deterministic=False, given=None):
        keys = jax.random.split(key, n)
        z, logq = jax.vmap(lambda k: self._sample_flat(params, k, deterministic))(keys)
        if detach:
            z = jax.lax.stop_gradient(z)
            scale = jnp.exp(params["log_scale"])
            logq = jax.vmap(
                lambda zz: jnp.sum(
                    -0.5 * ((zz - params["loc"]) / scale) ** 2
                    - 0.5 * jnp.log(2 * jnp.pi)
                    - params["log_scale"]
                )
            )(z)
        values = jax.vmap(self.unravel)(z)
        return values, logq

    def posterior_moments(self, params) -> Tuple[Array, Array]:
        return params["loc"], jnp.exp(2.0 * params["log_scale"])


class AutoFullRankNormal:
    """Full-covariance Normal via a lower-triangular scale factor."""

    space = "unconstrained"

    def __init__(self, comp: CompiledModel, init_scale: float = 0.1):
        self.comp = comp
        z0, self.unravel = jax.flatten_util.ravel_pytree(comp.z_example())
        self.dim = z0.shape[0]
        self.init_scale = init_scale

    def init_params(self, key):
        d = self.dim
        return {
            "loc": 0.01 * jax.random.normal(key, (d,)),
            "log_diag": jnp.full((d,), np.log(self.init_scale)),
            "tril": jnp.zeros((d, d)),
        }

    def _scale_tril(self, params):
        d = self.dim
        L = jnp.tril(params["tril"], -1) + jnp.diag(jnp.exp(params["log_diag"]))
        return L

    def sample_and_log_prob(self, params, key, n, detach=False, deterministic=False, given=None):
        L = self._scale_tril(params)

        def one(k):
            eps = jnp.where(deterministic, 0.0, 1.0) * jax.random.normal(k, (self.dim,))
            z = params["loc"] + L @ eps
            logq = (
                -0.5 * jnp.sum(eps**2)
                - 0.5 * self.dim * jnp.log(2 * jnp.pi)
                - jnp.sum(params["log_diag"])
            )
            return z, logq

        keys = jax.random.split(key, n)
        z, logq = jax.vmap(one)(keys)
        if detach:
            z = jax.lax.stop_gradient(z)
            solve = jax.vmap(
                lambda zz: jax.scipy.linalg.solve_triangular(L, zz - params["loc"], lower=True)
            )(z)
            logq = (
                -0.5 * jnp.sum(solve**2, -1)
                - 0.5 * self.dim * jnp.log(2 * jnp.pi)
                - jnp.sum(params["log_diag"])
            )
        values = jax.vmap(self.unravel)(z)
        return values, logq


def _made_degrees(d: int, hidden: int):
    deg_in = np.arange(1, d + 1)
    if d > 1:
        deg_hidden = (np.arange(hidden) % (d - 1)) + 1
    else:
        deg_hidden = np.ones(hidden, dtype=int)
    deg_out = np.arange(1, d + 1)
    return deg_in, deg_hidden, deg_out


def made_masks(d: int, hidden: int):
    """MADE masks for one autoregressive layer pair (in->hidden->2*out)."""
    deg_in, deg_h, deg_out = _made_degrees(d, hidden)
    m1 = (deg_h[None, :] >= deg_in[:, None]).astype(np.float32)  # [d, h]
    m2 = (deg_out[None, :] > deg_h[:, None]).astype(np.float32)  # [h, d] strict
    return jnp.asarray(m1), jnp.asarray(m2)


class AutoIAF:
    """Inverse-autoregressive-flow guide (the "autoregressive guide" of
    BASELINE.json): z = flow(eps) with one-pass sampling; MADE-masked
    dense layers keep everything as dense matmuls (MXU)."""

    space = "unconstrained"

    def __init__(self, comp: CompiledModel, num_flows: int = 3, hidden: int = 64,
                 init_scale: float = 0.1):
        self.comp = comp
        z0, self.unravel = jax.flatten_util.ravel_pytree(comp.z_example())
        self.dim = z0.shape[0]
        self.num_flows = num_flows
        self.hidden = max(hidden, 2 * self.dim)
        self.init_scale = init_scale
        self.mask1, self.mask2 = made_masks(self.dim, self.hidden)

    def init_params(self, key):
        d, h = self.dim, self.hidden
        params = {"base_loc": jnp.zeros((d,)), "base_log_scale": jnp.full((d,), np.log(self.init_scale))}
        for i in range(self.num_flows):
            k1, k2, key = jax.random.split(key, 3)
            params[f"flow{i}"] = {
                "w1": 0.1 * jax.random.normal(k1, (d, h)) / np.sqrt(d),
                "b1": jnp.zeros((h,)),
                "w2_m": 0.1 * jax.random.normal(k2, (h, d)) / np.sqrt(h),
                "w2_s": jnp.zeros((h, d)),
                "b2_m": jnp.zeros((d,)),
                "b2_s": jnp.zeros((d,)),
            }
        return params

    def _flow_forward(self, params, z):
        """One pass through all IAF layers; returns (z_out, sum_log_det)."""
        logdet = jnp.zeros(())
        for i in range(self.num_flows):
            p = params[f"flow{i}"]
            hidden = jnp.tanh(z @ (p["w1"] * self.mask1) + p["b1"])
            m = hidden @ (p["w2_m"] * self.mask2) + p["b2_m"]
            s = hidden @ (p["w2_s"] * self.mask2) + p["b2_s"]
            s = jnp.tanh(s)  # bounded log-scale for stability
            z = z * jnp.exp(s) + m
            logdet = logdet + jnp.sum(s)
            z = z[::-1]  # reverse ordering between layers
        return z, logdet

    def _sample_flat(self, params, k, deterministic):
        eps = jnp.where(deterministic, 0.0, 1.0) * jax.random.normal(k, (self.dim,))
        base_scale = jnp.exp(params["base_log_scale"])
        z0 = params["base_loc"] + base_scale * eps
        log_base = jnp.sum(
            -0.5 * eps**2 - 0.5 * jnp.log(2 * jnp.pi) - params["base_log_scale"]
        )
        z, logdet = self._flow_forward(params, z0)
        return z, log_base - logdet

    def sample_and_log_prob(self, params, key, n, detach=False, deterministic=False, given=None):
        keys = jax.random.split(key, n)
        z, logq = jax.vmap(lambda k: self._sample_flat(params, k, deterministic))(keys)
        if detach:
            raise NotImplementedError(
                "score-function estimation needs an invertible log_prob; "
                "use the pathwise estimator with AutoIAF"
            )
        values = jax.vmap(self.unravel)(z)
        return values, logq
