"""BASELINE config #5: variational autoencoder with neural (amortized)
guide — built entirely in the reference-style DSL with flax modules
lifted through BF.BrancherFunction.

The guide REUSES the model's data-loader variables (RandomIndices +
EmpiricalVariable) by object identity; the SVI engine feeds the same
minibatch draw to both p and q each step, which is what makes the guide
amortized (q(z | x_batch)).  Decoder/encoder matmuls batch over the
minibatch — MXU work; multi-host data-parallel ELBO shards this batch
axis (see dryrun_multichip).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

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


class VAEConfig(NamedTuple):
    latent_dim: int = 8
    hidden_dim: int = 64
    batch_size: int = 128


def make_vae_data(num_points: int = 2048, obs_dim: int = 64, true_latent: int = 4,
                  seed: int = 0) -> np.ndarray:
    """Synthetic binarized data on a low-dimensional manifold."""
    rng = np.random.RandomState(seed)
    w = rng.normal(0, 1.5, size=(true_latent, obs_dim))
    z = rng.normal(0, 1, size=(num_points, true_latent))
    probs = 1.0 / (1.0 + np.exp(-(z @ w)))
    return (rng.uniform(size=probs.shape) < probs).astype(np.float32)


def vae_model(
    data: np.ndarray,
    config: VAEConfig = VAEConfig(),
) -> Tuple[ProbabilisticModel, ProbabilisticModel]:
    """Returns (p_model, q_model) sharing data-loader variables."""
    import flax.linen as nn

    n, obs_dim = data.shape
    b, latent, hidden = config.batch_size, config.latent_dim, config.hidden_dim

    class Decoder(nn.Module):
        @nn.compact
        def __call__(self, z):
            h = nn.relu(nn.Dense(hidden)(z))
            return nn.Dense(obs_dim)(h)

    class Encoder(nn.Module):
        out: int

        @nn.compact
        def __call__(self, x):
            h = nn.relu(nn.Dense(hidden)(x))
            return nn.Dense(self.out)(h)

    idx = RandomIndices(n, b, "idx")
    xb = EmpiricalVariable(jnp.asarray(data), name="xb", indices=idx)

    # p(z) p(x|z); every per-datapoint term scales by N/B so the
    # minibatch ELBO is an unbiased estimate of the full-data ELBO
    z = NormalVariable(jnp.zeros((b, latent)), jnp.ones((b, latent)), "z",
                       log_prob_scale=float(n) / float(b))
    decoder = BF.BrancherFunction(Decoder(), name="decoder")
    x = BernoulliVariable(logits=decoder(z), name="x",
                          log_prob_scale=float(n) / float(b))
    x.observe(xb)
    p_model = ProbabilisticModel([x])

    # q(z|x): amortized — encoder reads the SAME minibatch variable
    enc_mu = BF.BrancherFunction(Encoder(latent), name="enc_mu")
    enc_logsig = BF.BrancherFunction(Encoder(latent), name="enc_logsig")
    qz = NormalVariable(
        enc_mu(xb), BF.exp(BF.clip(enc_logsig(xb), -5.0, 3.0)), "z",
        log_prob_scale=float(n) / float(b),
    )
    q_model = ProbabilisticModel([qz])
    p_model.set_posterior_model(q_model)
    return p_model, q_model
