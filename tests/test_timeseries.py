"""AR / Markov-series tests (BASELINE config #3): scan-compiled series,
log-prob parity with a hand-rolled formula, NUTS recovery of AR params."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brancher_tpu import NormalVariable, ProbabilisticModel
from brancher_tpu.distributions import Normal
from brancher_tpu.models.autoregressive import ar_model, make_ar_data
from brancher_tpu.stochastic_processes import ARProcess, MarkovProcess
from brancher_tpu.inference import sample, NUTS


def test_ar1_log_prob_matches_hand():
    data = make_ar_data(length=50, coeffs=(0.6,), noise=0.4, seed=0)
    series = ARProcess(50, 0.6, 0.4, name="s", init_loc=0.0, init_scale=1.0)
    model = ProbabilisticModel([series])
    comp = model.compiled()
    lp = float(comp.log_prob_one(comp.initial_params, {"s": jnp.asarray(data)}))

    def nlp(v, m, s):
        return -0.5 * ((v - m) / s) ** 2 - np.log(s) - 0.5 * np.log(2 * np.pi)

    expect = nlp(data[0], 0.0, 1.0)
    for t in range(1, 50):
        expect += nlp(data[t], 0.6 * data[t - 1], 0.4)
    np.testing.assert_allclose(lp, expect, rtol=1e-4)


def test_ar2_sampling_stationary(key):
    """AR(2) with known stationary variance; sample long series."""
    c1, c2, s = 0.5, 0.2, 0.3
    series = ARProcess(4000, np.asarray([c1, c2], np.float32), s, name="s",
                       order=2, init_loc=0.0, init_scale=0.5)
    model = ProbabilisticModel([series])
    vals = model.get_sample_dict(4, key=key)
    x = np.asarray(vals["s"])[:, 500:]  # discard transient
    # stationary variance of AR(2): gamma0 = s^2 (1-c2) / ((1+c2)((1-c2)^2-c1^2))
    g0 = s**2 * (1 - c2) / ((1 + c2) * ((1 - c2) ** 2 - c1**2))
    np.testing.assert_allclose(np.var(x), g0, rtol=0.15)


def test_markov_process_generic(key):
    x = MarkovProcess(
        30, Normal(), lambda prev, a: {"loc": a * prev, "scale": 0.5},
        links={"a": 0.8}, init_links={"loc": 0.0, "scale": 1.0},
        init_dist=Normal(), name="x",
    )
    model = ProbabilisticModel([x])
    vals = model.get_sample_dict(3, key=key)
    assert vals["x"].shape == (3, 30)
    lp = model.calculate_log_probability(vals)
    assert lp.shape == (3,)
    assert np.all(np.isfinite(np.asarray(lp)))


@pytest.mark.slow
@pytest.mark.slow
def test_ar1_nuts_recovers_parameters(key):
    data = make_ar_data(length=400, coeffs=(0.7,), noise=0.3, seed=0)
    model = ar_model(data, order=1)
    res = sample(model, kernel=NUTS(max_depth=8), num_samples=400,
                 num_warmup=400, num_chains=2, key=key)
    c = float(jnp.mean(res.samples["coeffs"]))
    s = float(jnp.mean(res.samples["noise_scale"]))
    assert abs(c - 0.7) < 0.12, c
    assert abs(s - 0.3) < 0.05, s
    assert int(res.diagnostics["num_divergences"]) == 0


@pytest.mark.slow
def test_observe_timeseries_missing_data(key):
    """AR(1) inference with NaN gaps: masked terms drop out, parameters
    are still recovered from the observed stretches (ROADMAP r1 #12)."""
    from brancher_tpu.models.autoregressive import make_ar_data
    from brancher_tpu.standard_variables import LogNormalVariable, NormalVariable
    from brancher_tpu.stochastic_processes import ARProcess, observe_timeseries
    from brancher_tpu.variables import ProbabilisticModel
    from brancher_tpu.inference import NUTS, sample

    data = make_ar_data(length=600, coeffs=(0.7,), noise=0.3, seed=0).copy()
    rng = np.random.RandomState(1)
    holes = rng.choice(600, size=60, replace=False)
    data[holes] = np.nan

    coeffs = NormalVariable(np.zeros(1, np.float32), 0.5 * np.ones(1, np.float32), "coeffs")
    noise = LogNormalVariable(-1.0, 0.5, "noise_scale")
    series = ARProcess(len(data), coeffs, noise, name="series", order=1,
                       init_loc=0.0, init_scale=1.0)
    observe_timeseries(series, data)
    model = ProbabilisticModel([series])

    res = sample(model, kernel=NUTS(max_depth=8), num_samples=400,
                 num_warmup=400, num_chains=4, key=key)
    c = float(jnp.mean(res.samples["coeffs"]))
    n = float(jnp.mean(res.samples["noise_scale"]))
    assert abs(c - 0.7) < 0.1, c
    assert abs(n - 0.3) < 0.05, n
    assert float(res.diagnostics["num_divergences"]) == 0
    # a NaN anywhere in the likelihood would poison everything
    assert np.isfinite(c) and np.isfinite(n)


def test_timeseries_helper_masks():
    from brancher_tpu.stochastic_processes import Timeseries

    vals, mask = Timeseries(np.asarray([1.0, np.nan, 3.0], np.float32))
    np.testing.assert_array_equal(np.asarray(mask), [1.0, 0.0, 1.0])
    np.testing.assert_array_equal(np.asarray(vals), [1.0, 0.0, 3.0])
