"""Simulation-based calibration of NUTS (SURVEY.md §4.3: Geweke/SBC-style
checks).  Each vectorized 'chain' carries its own synthetic dataset drawn
from the prior predictive; posterior ranks of the true parameter must be
uniform."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from brancher_tpu.inference.vectorized_nuts import nuts_batched


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
    ranks = jnp.sum(thinned < mu_true[:, None], axis=1)  # in [0, 32]
    counts = np.bincount(np.asarray(ranks), minlength=33)
    # chi-square uniformity test; p > 0.005 passes
    chi2, pval = st.chisquare(counts)
    assert pval > 0.005, (pval, counts)

    # also: posterior mean tracks the analytic conjugate mean per rep
    post_var = 1.0 / (1 / prior_scale**2 + n_obs / lik_scale**2)
    analytic = post_var * jnp.sum(data, -1) / lik_scale**2
    err = np.abs(np.asarray(jnp.mean(draws, -1) - analytic))
    assert np.median(err) < 3 * np.sqrt(post_var / 32), np.median(err)
