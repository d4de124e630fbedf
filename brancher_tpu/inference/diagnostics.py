"""Sampler diagnostics: ESS, split R-hat.

No reference counterpart (Brancher has no MCMC; SURVEY.md §0).  Standard
definitions: Geyer initial-monotone-sequence ESS computed via FFT
autocovariance and split-chain potential scale reduction (Gelman-Rubin
R-hat).

These run on the HOST in numpy, deliberately: they are one-shot
post-processing, and compiling the FFT program on the axon TPU backend
costs ~65 s (measured round 2) versus <0.5 s of numpy — diagnostics must
never dominate a benchmark or a short run.  The samples transfer
device→host once (they are about to be handed to the user anyway).
"""
from __future__ import annotations

import numpy as np


def _autocovariance_fft(x: np.ndarray) -> np.ndarray:
    """Autocovariance along axis 1.  x: [chains, T, P] -> [chains, T, P]."""
    t = x.shape[1]
    xc = x - np.mean(x, axis=1, keepdims=True)
    n_fft = int(2 ** np.ceil(np.log2(2 * t)))
    f = np.fft.rfft(xc, n=n_fft, axis=1)
    acov = np.fft.irfft(f * np.conj(f), n=n_fft, axis=1)[:, :t]
    return np.real(acov) / t


def effective_sample_size(samples) -> np.ndarray:
    """ESS of [chains, draws] or [chains, draws, ...] samples (per column).

    Mean-of-chain autocovariances with between-chain correction
    (BDA3 / Stan), Geyer initial positive + monotone sequence on paired
    sums.  Capped at chains*draws (the independent-sampling bound).
    """
    x = np.asarray(samples, dtype=np.float64)
    in_ndim = x.ndim
    if x.ndim == 1:
        x = x[None, :]
    chains, draws = x.shape[0], x.shape[1]
    if draws < 2:
        # Too few draws to estimate autocovariance (the draws-1 divisor
        # below would warn/blow up); report NaN explicitly (VERDICT r2
        # weak #7 — keep dryrun/driver artifacts warning-free).
        nan = np.full(x.shape[2:] if in_ndim > 2 else (), np.nan)
        return nan if in_ndim > 2 else np.squeeze(nan)
    flat = x.reshape(chains, draws, -1)

    acov = _autocovariance_fft(flat)  # [chains, T, P]
    mean_acov = np.mean(acov, axis=0)  # [T, P]
    chain_means = np.mean(flat, axis=1)  # [chains, P]
    w = np.mean(acov[:, 0, :], axis=0) * draws / (draws - 1.0)  # within var
    if chains > 1:
        b_over_n = np.var(chain_means, axis=0, ddof=1)
    else:
        b_over_n = np.zeros_like(w)
    var_plus = w * (draws - 1.0) / draws + b_over_n

    # rho_t = 1 - (W - mean autocov_t) / var_plus
    rho = 1.0 - (w[None, :] - mean_acov) / var_plus[None, :]
    rho[0] = 1.0

    # Geyer: paired sums P_k = rho_{2k} + rho_{2k+1}
    t_half = draws // 2
    p = rho[0 : 2 * t_half : 2] + rho[1 : 2 * t_half : 2]  # [t_half, P]
    # initial positive sequence: zero out after first negative
    p = p * np.cumprod(p > 0.0, axis=0)
    # initial monotone: running minimum
    p = np.maximum(np.minimum.accumulate(p, axis=0), 0.0)
    tau = -1.0 + 2.0 * np.sum(p, axis=0)
    tau = np.maximum(tau, 1.0 / np.log10(float(draws * chains)))
    ess = chains * draws / tau
    ess = np.minimum(ess, float(chains * draws))
    return ess.reshape(x.shape[2:]) if in_ndim > 2 else np.squeeze(ess)


# ----------------------------------------------------------------------
# Device-side ESS (ROADMAP r2 perf #3)
#
# The host path above transfers the full [chains, draws, dim] array over
# the axon tunnel (~130 MB, seconds, variable at bench scale).  This path
# computes the same Geyer initial-monotone estimate ON DEVICE and
# transfers only the [dim] result.  Crucially it avoids FFT — the XLA FFT
# program cost ~65 s to compile on this backend (round 2) — and instead
# evaluates the autocovariance directly at the first `max_lag` lags with
# one small lax.scan of masked elementwise contractions (O(K·C·S·P) VPU
# work; ~50 GFLOP at bench scale, milliseconds).
#
# Truncation semantics: Geyer's initial positive sequence almost always
# terminates within a few lags for chains healthy enough to report ESS
# on; if it has NOT terminated by max_lag the truncated sum
# underestimates tau (overestimates ESS), so we detect that case and
# clamp tau to the worst-case bound tau >= 2*sum(p) (treating the
# remaining mass as if the last pair persisted to draws/2 pairs).
# ----------------------------------------------------------------------

_ESS_DEVICE_CACHE: dict = {}


def _ess_device_fn(max_lag: int):
    """Build (and cache) the jitted [C,S,P] -> [P] device ESS program."""
    import jax
    import jax.numpy as jnp

    fn = _ESS_DEVICE_CACHE.get(max_lag)
    if fn is not None:
        return fn

    def ess(flat):
        chains, draws, _ = flat.shape
        k = min(max_lag, draws - 1)
        xc = flat - jnp.mean(flat, axis=1, keepdims=True)
        t_idx = jnp.arange(draws)

        def lag_cov(_, lag):
            rolled = jnp.roll(xc, -lag, axis=1)
            mask = (t_idx < draws - lag).astype(flat.dtype)
            ck = jnp.einsum("csp,csp,s->cp", xc, rolled, mask) / draws
            return None, ck

        _, acov = jax.lax.scan(lag_cov, None, jnp.arange(k))  # [K, C, P]
        mean_acov = jnp.mean(acov, axis=1)  # [K, P]
        w = jnp.mean(acov[0], axis=0) * draws / (draws - 1.0)
        if chains > 1:
            chain_means = jnp.mean(flat, axis=1)
            b_over_n = jnp.var(chain_means, axis=0, ddof=1)
        else:
            b_over_n = jnp.zeros_like(w)
        var_plus = w * (draws - 1.0) / draws + b_over_n

        rho = 1.0 - (w[None, :] - mean_acov) / var_plus[None, :]
        rho = rho.at[0].set(1.0)
        k_half = k // 2
        p = rho[0 : 2 * k_half : 2] + rho[1 : 2 * k_half : 2]
        alive = jnp.cumprod((p > 0.0).astype(flat.dtype), axis=0)
        p = p * alive
        p = jnp.maximum(jax.lax.cummin(p, axis=0), 0.0)
        tau = -1.0 + 2.0 * jnp.sum(p, axis=0)
        # truncation guard: if the positive sequence survived to the last
        # pair, extend it pessimistically (last pair repeated to draws/2)
        unterminated = alive[-1] > 0.0
        tau_pess = tau + 2.0 * p[-1] * (draws // 2 - k_half)
        tau = jnp.where(unterminated, tau_pess, tau)
        tau = jnp.maximum(tau, 1.0 / np.log10(float(draws * chains)))
        return jnp.minimum(chains * draws / tau, float(chains * draws))

    fn = jax.jit(ess)
    _ESS_DEVICE_CACHE[max_lag] = fn
    return fn


def effective_sample_size_device(samples, max_lag: int = 256):
    """ESS of [chains, draws, ...] samples, computed on device.

    Same estimator as :func:`effective_sample_size` with the
    autocovariance truncated at ``max_lag`` lags (pessimistic tail
    correction when unterminated; see module comment).  Returns a device
    array of shape ``samples.shape[2:]`` — only O(dim) bytes ever cross
    to the host.
    """
    import jax.numpy as jnp

    x = jnp.asarray(samples)
    if x.dtype not in (jnp.float32, jnp.float64):
        x = x.astype(jnp.float32)
    if x.ndim == 1:
        x = x[None, :]
    event_shape = x.shape[2:]
    if x.shape[1] < 2:
        nan = jnp.full(event_shape, jnp.nan)
        return nan if event_shape else jnp.squeeze(nan)
    flat = x.reshape(x.shape[0], x.shape[1], -1)
    ess = _ess_device_fn(int(max_lag))(flat)
    return ess.reshape(event_shape) if event_shape else jnp.squeeze(ess)


def potential_scale_reduction_device(samples):
    """Split R-hat of [chains, draws, ...] samples, computed on device."""
    import jax.numpy as jnp

    x = jnp.asarray(samples)
    if x.dtype not in (jnp.float32, jnp.float64):
        x = x.astype(jnp.float32)
    if x.ndim == 1:
        x = x[None, :]
    event_shape = x.shape[2:]
    draws = x.shape[1]
    if draws < 4:
        nan = jnp.full(event_shape, jnp.nan)
        return nan if event_shape else jnp.squeeze(nan)
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
    return rhat.reshape(event_shape) if event_shape else jnp.squeeze(rhat)


def potential_scale_reduction(samples) -> np.ndarray:
    """Split R-hat of [chains, draws, ...] samples."""
    x = np.asarray(samples, dtype=np.float64)
    in_ndim = x.ndim
    if x.ndim == 1:
        x = x[None, :]
    draws = x.shape[1]
    if draws < 4:
        # Split halves need >= 2 draws each for the ddof=1 variances;
        # report NaN explicitly instead of warning (VERDICT r2 weak #7).
        nan = np.full(x.shape[2:] if in_ndim > 2 else (), np.nan)
        return nan if in_ndim > 2 else np.squeeze(nan)
    half = draws // 2
    split = np.concatenate([x[:, :half], x[:, half : 2 * half]], axis=0)
    m, n = split.shape[0], split.shape[1]
    flat = split.reshape(m, n, -1)
    chain_means = np.mean(flat, axis=1)
    chain_vars = np.var(flat, axis=1, ddof=1)
    w = np.mean(chain_vars, axis=0)
    b = n * np.var(chain_means, axis=0, ddof=1)
    var_plus = (n - 1.0) / n * w + b / n
    rhat = np.sqrt(var_plus / w)
    return rhat.reshape(x.shape[2:]) if in_ndim > 2 else np.squeeze(rhat)


def _rank_normalize(x: np.ndarray) -> np.ndarray:
    """Average-rank normal-quantile transform over ALL draws (Vehtari et
    al. 2021 §3): pooled fractional ranks -> Phi^{-1}."""
    from scipy.special import ndtri

    chains, draws = x.shape[0], x.shape[1]
    flat = x.reshape(chains * draws, -1)
    order = np.argsort(flat, axis=0)
    ranks = np.empty_like(flat)
    rng_idx = np.arange(flat.shape[0])[:, None]
    np.put_along_axis(ranks, order, rng_idx.astype(flat.dtype) + 1.0, axis=0)
    frac = (ranks - 0.375) / (flat.shape[0] + 0.25)  # Blom offsets
    return ndtri(frac).reshape(x.shape)


def rank_normalized_rhat(samples) -> np.ndarray:
    """Rank-normalized split R-hat (Vehtari, Gelman, Simpson, Carpenter,
    Bürkner 2021): robust to heavy tails and location-invariant — the
    modern default convergence diagnostic (ROADMAP r1 #10)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[None, :]
    return potential_scale_reduction(_rank_normalize(x))


def folded_rhat(samples) -> np.ndarray:
    """Rank-normalized split R-hat of |x - median|: detects chains that
    agree in location but differ in SCALE (ibid. §3.2)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[None, :]
    folded = np.abs(x - np.median(x, axis=(0, 1), keepdims=True))
    return potential_scale_reduction(_rank_normalize(folded))


def max_rhat(samples) -> np.ndarray:
    """max(rank-normalized, folded) — the value to threshold (< 1.01)."""
    return np.maximum(rank_normalized_rhat(samples), folded_rhat(samples))
