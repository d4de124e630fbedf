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


# -- device-side path (ROADMAP r2 perf #3) ------------------------------

def _ar1(key, chains, draws, rho, dim=3):
    eps = np.asarray(jax.random.normal(key, (chains, draws, dim)))
    x = np.zeros_like(eps)
    x[:, 0] = eps[:, 0]
    for t in range(1, draws):
        x[:, t] = rho * x[:, t - 1] + np.sqrt(1 - rho**2) * eps[:, t]
    return x


def test_device_ess_matches_host(key):
    from brancher_tpu.inference.diagnostics import (
        effective_sample_size_device,
    )

    x = _ar1(key, chains=4, draws=2000, rho=0.9)
    host = effective_sample_size(x)
    dev = np.asarray(effective_sample_size_device(jnp.asarray(x)))
    # same Geyer estimator; device truncates lags at 256 (AR(1) rho=0.9
    # terminates within ~40 lags so truncation is inactive here)
    assert dev.shape == host.shape
    np.testing.assert_allclose(dev, host, rtol=0.02)


def test_device_ess_truncation_is_pessimistic(key):
    from brancher_tpu.inference.diagnostics import (
        effective_sample_size_device,
    )

    # rho=0.999: tau ~ 2000 — the positive sequence does NOT terminate
    # within max_lag=64, so the device estimate must be <= (not wildly
    # above) the host full-lag estimate
    x = _ar1(key, chains=4, draws=4000, rho=0.999, dim=1)
    host = float(effective_sample_size(x)[0])
    dev = float(effective_sample_size_device(jnp.asarray(x), max_lag=64)[0])
    assert dev <= host * 1.1, (dev, host)


def test_device_rhat_matches_host(key):
    from brancher_tpu.inference.diagnostics import (
        potential_scale_reduction_device,
    )

    x = _ar1(key, chains=4, draws=1000, rho=0.5)
    x[2] += 1.5  # one displaced chain => R-hat well above 1
    host = potential_scale_reduction(x)
    dev = np.asarray(potential_scale_reduction_device(jnp.asarray(x)))
    np.testing.assert_allclose(dev, host, rtol=1e-4)
    assert np.all(dev > 1.1)
