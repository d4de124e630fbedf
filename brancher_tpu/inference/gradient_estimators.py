"""ELBO gradient estimators.

Reference parity: Brancher's ``gradient_estimators.py`` strategy objects —
``PathwiseDerivativeEstimator`` (reparameterization), ``BlackBoxEstimator``
(score-function/REINFORCE), ``Taylor1Estimator`` (first-order Taylor
approximation) — SURVEY.md §2 "Gradient estimators".

Each estimator turns per-sample ``log_p`` / ``log_q`` arrays (shape [S])
into a scalar surrogate loss whose gradient (under jax.grad) is the chosen
ELBO gradient estimator.  ``detach_samples`` tells the SVI engine whether
to stop gradients through the sampled values before evaluating densities.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


class GradientEstimator:
    detach_samples: bool = False
    deterministic: bool = False  # evaluate at the guide mean instead of sampling

    def surrogate_loss(self, log_p: Array, log_q: Array) -> Array:
        raise NotImplementedError


class PathwiseDerivativeEstimator(GradientEstimator):
    """Reparameterized (pathwise) gradients: requires a reparameterizable
    guide; gradients flow through the sampler itself."""

    detach_samples = False

    def surrogate_loss(self, log_p, log_q):
        return -jnp.mean(log_p - log_q)


class BlackBoxEstimator(GradientEstimator):
    """Score-function (REINFORCE) estimator; works for any guide, higher
    variance.  Samples are detached; the score term carries the gradient."""

    detach_samples = True

    def surrogate_loss(self, log_p, log_q):
        f = log_p - log_q
        score_term = jax.lax.stop_gradient(f) * log_q
        return -jnp.mean(score_term + f)


class Taylor1Estimator(GradientEstimator):
    """First-order Taylor (delta-method) approximation of the ELBO: the
    expectation is evaluated at the guide's mean point only, giving a
    deterministic, zero-variance (but biased) gradient."""

    detach_samples = False
    deterministic = True

    def surrogate_loss(self, log_p, log_q):
        return -jnp.mean(log_p - log_q)
