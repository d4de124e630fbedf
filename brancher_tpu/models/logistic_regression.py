"""BASELINE config #2: Bayesian logistic regression.

TPU notes: the log-joint is one X @ w matmul (MXU) + elementwise
Bernoulli terms (VPU, fused by XLA).  With minibatching the observed
likelihood rescales by N/B (SURVEY.md §7.6 "correct N/B log-lik
scaling").  A fused Pallas log-posterior+grad kernel for this family
lives in ops/pallas_logreg.py.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp

from .. import functions as BF
from ..standard_variables import (
    BernoulliVariable,
    EmpiricalVariable,
    NormalVariable,
    RandomIndices,
)
from ..variables import ProbabilisticModel


def make_logreg_data(
    num_points: int = 1000, dim: int = 32, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    w_true = rng.normal(0, 1, size=dim).astype(np.float32) / np.sqrt(dim)
    x = rng.normal(0, 1, size=(num_points, dim)).astype(np.float32)
    logits = x @ w_true
    y = (rng.uniform(size=num_points) < 1.0 / (1.0 + np.exp(-logits))).astype(np.int32)
    return x, y, w_true


def logistic_regression_model(
    x: np.ndarray,
    y: np.ndarray,
    prior_scale: float = 1.0,
    batch_size: Optional[int] = None,
):
    """w ~ N(0, prior_scale I); y_i ~ Bernoulli(sigmoid(x_i.w)).

    With ``batch_size``: the reference's RandomIndices/EmpiricalVariable
    minibatch pattern — x and y are loaded through the same index draw,
    and the likelihood is rescaled by N/B.
    """
    n, d = x.shape
    w = NormalVariable(jnp.zeros(d), prior_scale * jnp.ones(d), "w")
    if batch_size is None:
        logits = BF.matmul(jnp.asarray(x), w)
        yv = BernoulliVariable(logits=logits, name="y")
        yv.observe(jnp.asarray(y))
        return ProbabilisticModel([yv])

    idx = RandomIndices(n, batch_size, "idx")
    xb = EmpiricalVariable(jnp.asarray(x), name="xb", indices=idx)
    yb = EmpiricalVariable(jnp.asarray(y), name="yb", indices=idx)
    logits = BF.matmul(xb, w)
    yv = BernoulliVariable(
        logits=logits, name="y", log_prob_scale=float(n) / float(batch_size)
    )
    yv.observe(yb)
    return ProbabilisticModel([yv])
