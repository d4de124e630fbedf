"""Simulation-based calibration (SURVEY.md §4.3: Geweke/SBC-style
checks).  Each vectorized 'chain' carries its own synthetic dataset drawn
from the prior predictive; posterior ranks of the true parameter must be
uniform.  Covers the three engines the bench leans on (VERDICT r4 weak
#6): vectorized NUTS on a conjugate target, ChEES on the same target,
and NUTS on the non-centered hierarchy shape the headline samples."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from brancher_tpu.inference.chees import chees_hmc
from brancher_tpu.inference.vectorized_nuts import nuts_batched


def _rank_uniformity_pval(thinned, truth):
    """chi-square p-value of SBC ranks of `truth` among `thinned` draws.

    thinned: [reps, n_draws]; truth: [reps]."""
    n_draws = thinned.shape[1]
    ranks = jnp.sum(thinned < truth[:, None], axis=1)
    counts = np.bincount(np.asarray(ranks), minlength=n_draws + 1)
    _, pval = st.chisquare(counts)
    return pval, counts


@pytest.mark.slow
def test_sbc_ranks_uniform(key):
    reps, n_obs = 128, 10
    prior_scale, lik_scale = 2.0, 1.0

    k_mu, k_data, k_run = jax.random.split(key, 3)
    mu_true = prior_scale * jax.random.normal(k_mu, (reps,))
    data = mu_true[:, None] + lik_scale * jax.random.normal(k_data, (reps, n_obs))

    def vg(z):  # z: [reps, 1] — per-rep dataset baked into the potential
        mu = z[:, 0]
        lp = -0.5 * (mu / prior_scale) ** 2
        ll = -0.5 * jnp.sum((data - mu[:, None]) ** 2, -1) / lik_scale**2
        val = lp + ll
        grad = (-mu / prior_scale**2 + jnp.sum(data - mu[:, None], -1) / lik_scale**2)
        return val, grad[:, None]

    z0 = prior_scale * jax.random.normal(jax.random.fold_in(key, 7), (reps, 1))
    res = jax.jit(
        lambda k: nuts_batched(vg, z0, num_warmup=300, num_samples=255, key=k,
                               max_depth=6)
    )(k_run)

    draws = res.samples[:, :, 0]  # [reps, 255]
    # thin to ~independent draws to make the rank distribution exact
    thinned = draws[:, ::8]  # 32 draws per rep
    # chi-square uniformity test; p > 0.005 passes
    pval, counts = _rank_uniformity_pval(thinned, mu_true)
    assert pval > 0.005, (pval, counts)

    # also: posterior mean tracks the analytic conjugate mean per rep
    post_var = 1.0 / (1 / prior_scale**2 + n_obs / lik_scale**2)
    analytic = post_var * jnp.sum(data, -1) / lik_scale**2
    err = np.abs(np.asarray(jnp.mean(draws, -1) - analytic))
    assert np.median(err) < 3 * np.sqrt(post_var / 32), np.median(err)


@pytest.mark.slow
def test_sbc_ranks_uniform_chees(key):
    """ChEES rank calibration (VERDICT r4 weak #6): the bench insurance
    engine — whose divergences were invisible until round 5 — must be
    calibrated on the conjugate target, not just fast.  The shared
    trajectory/step adaptation couples chains' KERNELS, but each chain's
    accept test still targets its own per-rep posterior."""
    reps, n_obs = 128, 10
    prior_scale, lik_scale = 2.0, 1.0

    k_mu, k_data, k_run = jax.random.split(key, 3)
    mu_true = prior_scale * jax.random.normal(k_mu, (reps,))
    data = mu_true[:, None] + lik_scale * jax.random.normal(k_data, (reps, n_obs))

    def vg(z):
        mu = z[:, 0]
        lp = -0.5 * (mu / prior_scale) ** 2
        ll = -0.5 * jnp.sum((data - mu[:, None]) ** 2, -1) / lik_scale**2
        grad = (-mu / prior_scale**2
                + jnp.sum(data - mu[:, None], -1) / lik_scale**2)
        return lp + ll, grad[:, None]

    z0 = prior_scale * jax.random.normal(jax.random.fold_in(key, 7), (reps, 1))
    res = jax.jit(
        lambda k: chees_hmc(vg, z0, num_warmup=400, num_samples=255, key=k)
    )(k_run)

    thinned = res.samples[:, ::8, 0]  # 32 ~independent draws per rep
    pval, counts = _rank_uniformity_pval(thinned, mu_true)
    assert pval > 0.005, (pval, counts)
    assert int(jnp.sum(res.diverging)) == 0


@pytest.mark.slow
def test_sbc_ranks_uniform_noncentered_hierarchy(key):
    """SBC on the non-centered hierarchy shape the bench headline
    samples (VERDICT r4 weak #6): tau ~ LogNormal(0, s), theta = tau *
    raw with raw ~ N(0, I_J), y_jn ~ N(theta_j, sigma).  Ranks checked
    for BOTH the hierarchy scale (funnel axis) and a centered
    coordinate."""
    reps, j_n, n_obs = 128, 4, 5
    s_tau, sigma = 0.75, 1.0

    k_u, k_raw, k_data, k_run = jax.random.split(key, 4)
    u_true = s_tau * jax.random.normal(k_u, (reps,))  # log tau
    raw_true = jax.random.normal(k_raw, (reps, j_n))
    theta_true = jnp.exp(u_true)[:, None] * raw_true
    data = theta_true[:, :, None] + sigma * jax.random.normal(
        k_data, (reps, j_n, n_obs))

    def logp_all(z):  # [reps, 1+J] = (u, raw)
        u, raw = z[:, 0], z[:, 1:]
        theta = jnp.exp(u)[:, None] * raw
        lp = -0.5 * (u / s_tau) ** 2 - 0.5 * jnp.sum(raw**2, -1)
        ll = -0.5 * jnp.sum((data - theta[:, :, None]) ** 2, (-1, -2)) / sigma**2
        return lp + ll

    def vg(z):  # rows are independent, so grad-of-sum is the row grad
        return logp_all(z), jax.grad(lambda q: jnp.sum(logp_all(q)))(z)

    z0 = 0.1 * jax.random.normal(jax.random.fold_in(key, 11), (reps, 1 + j_n))
    res = jax.jit(
        lambda k: nuts_batched(vg, z0, num_warmup=500, num_samples=511,
                               key=k, max_depth=8, target_accept=0.9)
    )(k_run)

    u_thin = res.samples[:, ::16, 0]  # 32 draws
    pval_u, counts_u = _rank_uniformity_pval(u_thin, u_true)
    assert pval_u > 0.005, (pval_u, counts_u)
    theta1 = jnp.exp(res.samples[:, ::16, 0]) * res.samples[:, ::16, 1]
    pval_t, counts_t = _rank_uniformity_pval(theta1, theta_true[:, 0])
    assert pval_t > 0.005, (pval_t, counts_t)
