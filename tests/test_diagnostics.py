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


def test_rank_normalized_rhat_heavy_tails(key):
    """Rank normalization keeps R-hat meaningful for Cauchy-like draws,
    and the folded variant catches scale mismatches plain R-hat misses."""
    import numpy as np
    from brancher_tpu.inference.diagnostics import (
        folded_rhat, max_rhat, rank_normalized_rhat,
    )

    rng = np.random.RandomState(0)
    good = rng.standard_cauchy(size=(4, 2000))
    assert float(rank_normalized_rhat(good)) < 1.01
    assert float(max_rhat(good)) < 1.02

    # same location, different scales: folded R-hat must flag it
    scale_mix = np.concatenate(
        [rng.normal(0, 1, size=(2, 2000)), rng.normal(0, 5, size=(2, 2000))]
    )
    assert float(folded_rhat(scale_mix)) > 1.1
    # location shift flagged by the rank-normalized variant
    loc_mix = np.concatenate(
        [rng.normal(0, 1, size=(2, 2000)), rng.normal(3, 1, size=(2, 2000))]
    )
    assert float(rank_normalized_rhat(loc_mix)) > 1.5
