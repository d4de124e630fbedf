"""ESS / R-hat estimator sanity (SURVEY.md §4.3)."""
import jax
import jax.numpy as jnp
import numpy as np

from brancher_tpu.inference.diagnostics import (
    effective_sample_size,
    potential_scale_reduction,
)


def test_ess_iid_near_n(key):
    x = jax.random.normal(key, (4, 1000))
    ess = float(effective_sample_size(x))
    assert 2500 < ess <= 4000, ess


def test_ess_correlated_much_less(key):
    # AR(1) with rho=0.95: tau ~ (1+rho)/(1-rho) = 39
    rho = 0.95
    eps = np.asarray(jax.random.normal(key, (4, 4000)))
    x = np.zeros_like(eps)
    x[:, 0] = eps[:, 0]
    for t in range(1, eps.shape[1]):
        x[:, t] = rho * x[:, t - 1] + np.sqrt(1 - rho**2) * eps[:, t]
    ess = float(effective_sample_size(jnp.asarray(x)))
    expected = 4 * 4000 / ((1 + rho) / (1 - rho))
    assert 0.4 * expected < ess < 2.5 * expected, (ess, expected)


def test_rhat_mixed_chains_near_one(key):
    x = jax.random.normal(key, (4, 1000))
    r = float(potential_scale_reduction(x))
    assert abs(r - 1.0) < 0.02


def test_rhat_detects_unmixed(key):
    x = np.array(jax.random.normal(key, (4, 500)))
    x[0] += 5.0  # one chain stuck elsewhere
    r = float(potential_scale_reduction(jnp.asarray(x)))
    assert r > 1.5, r


def test_ess_multidim_shape(key):
    x = jax.random.normal(key, (2, 300, 5))
    ess = effective_sample_size(x)
    assert ess.shape == (5,)
