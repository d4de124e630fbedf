"""Sampler diagnostics: ESS, split R-hat.

No reference counterpart (Brancher has no MCMC; SURVEY.md §0).  Standard
definitions: Geyer initial-monotone-sequence ESS computed via FFT
autocovariance (vectorizes over parameters on the VPU) and split-chain
potential scale reduction (Gelman-Rubin R-hat).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _autocovariance_fft(x: Array) -> Array:
    """Autocovariance along axis 0 for each column.  x: [T, ...]."""
    t = x.shape[0]
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    n_fft = int(2 ** np.ceil(np.log2(2 * t)))
    f = jnp.fft.rfft(xc, n=n_fft, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=n_fft, axis=0)[:t]
    return jnp.real(acov) / t


def effective_sample_size(samples: Array) -> Array:
    """ESS of [chains, draws] or [chains, draws, ...] samples (per column).

    Uses the rank-normalized-free classic estimator: mean-of-chain
    autocovariances with between-chain correction (BDA3 / Stan), Geyer
    initial positive + monotone sequence on paired sums.
    """
    x = jnp.asarray(samples)
    if x.ndim == 1:
        x = x[None, :]
    chains, draws = x.shape[0], x.shape[1]
    flat = x.reshape(chains, draws, -1)

    acov = jax.vmap(_autocovariance_fft, in_axes=0)(
        jnp.moveaxis(flat, 1, 1)
    )  # [chains, T, P]
    mean_acov = jnp.mean(acov, axis=0)  # [T, P]
    chain_means = jnp.mean(flat, axis=1)  # [chains, P]
    w = jnp.mean(acov[:, 0, :], axis=0) * draws / (draws - 1.0)  # within var
    if chains > 1:
        b_over_n = jnp.var(chain_means, axis=0, ddof=1)
    else:
        b_over_n = jnp.zeros_like(w)
    var_plus = w * (draws - 1.0) / draws + b_over_n

    # rho_t = 1 - (W - mean autocov_t) / var_plus
    rho = 1.0 - (w[None, :] - mean_acov) / var_plus[None, :]
    rho = rho.at[0].set(1.0)

    # Geyer: paired sums P_k = rho_{2k} + rho_{2k+1}
    t_half = draws // 2
    even = rho[0 : 2 * t_half : 2]
    odd = rho[1 : 2 * t_half : 2]
    p = even + odd  # [t_half, P]
    # initial positive sequence: zero out after first negative
    pos_mask = jnp.cumprod(p > 0.0, axis=0).astype(p.dtype)
    p = p * pos_mask
    # initial monotone: running minimum
    p = jax.lax.associative_scan(jnp.minimum, p, axis=0)
    p = jnp.maximum(p, 0.0)
    tau = -1.0 + 2.0 * jnp.sum(p, axis=0)
    tau = jnp.maximum(tau, 1.0 / jnp.log10(jnp.asarray(float(draws * chains))))
    ess = chains * draws / tau
    ess = jnp.minimum(ess, float(chains * draws))
    return ess.reshape(x.shape[2:]) if samples.ndim > 2 else jnp.squeeze(ess)


def potential_scale_reduction(samples: Array) -> Array:
    """Split R-hat of [chains, draws, ...] samples."""
    x = jnp.asarray(samples)
    if x.ndim == 1:
        x = x[None, :]
    chains, draws = x.shape[0], x.shape[1]
    half = draws // 2
    split = jnp.concatenate([x[:, :half], x[:, half : 2 * half]], axis=0)
    m, n = split.shape[0], split.shape[1]
    flat = split.reshape(m, n, -1)
    chain_means = jnp.mean(flat, axis=1)
    chain_vars = jnp.var(flat, axis=1, ddof=1)
    w = jnp.mean(chain_vars, axis=0)
    b = n * jnp.var(chain_means, axis=0, ddof=1)
    var_plus = (n - 1.0) / n * w + b / n
    rhat = jnp.sqrt(var_plus / w)
    return rhat.reshape(x.shape[2:]) if samples.ndim > 2 else jnp.squeeze(rhat)
