"""NonCenteredNormalVariable (VERDICT r3 #9 / weak #4) + ess_vars.

The non-centered helper must (a) define the SAME joint distribution as
the centered model — forward marginals and posteriors agree — while (b)
exposing only the well-conditioned standard-normal latent to the
sampler, and (c) its deterministic centered node must be scoreable via
sample(..., ess_vars=[...]).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import brancher_tpu.functions as BF
from brancher_tpu import (
    LogNormalVariable,
    NonCenteredNormalVariable,
    NormalVariable,
    ProbabilisticModel,
)
from brancher_tpu.inference import NUTS, sample

TAU_SD = 0.75


def _models(dim, y_obs):
    tau_c = LogNormalVariable(jnp.zeros(dim), TAU_SD * jnp.ones(dim), "tau")
    w_c = NormalVariable(jnp.zeros(dim), tau_c, "w")
    y_c = NormalVariable(BF.sum(w_c), 1.0, "y", observed=y_obs)
    centered = ProbabilisticModel([y_c])

    tau_n = LogNormalVariable(jnp.zeros(dim), TAU_SD * jnp.ones(dim), "tau")
    w_n = NonCenteredNormalVariable(0.0, tau_n, name="w", shape=(dim,))
    y_n = NormalVariable(BF.sum(w_n), 1.0, "y", observed=y_obs)
    noncentered = ProbabilisticModel([y_n])
    return centered, noncentered


def test_forward_marginal_matches_centered():
    # Var(w) = E[tau^2] = exp(2 * TAU_SD^2) for tau ~ LogNormal(0, TAU_SD)
    tau = LogNormalVariable(0.0, TAU_SD, "tau")
    w = NonCenteredNormalVariable(0.0, tau, name="w", shape=())
    m = ProbabilisticModel([w])
    s = m.get_sample(40000, key=jax.random.PRNGKey(0))
    draws = np.asarray(s["w"].values, np.float64)
    expect_var = np.exp(2.0 * TAU_SD**2)
    assert np.mean(draws) == pytest.approx(0.0, abs=0.05)
    assert np.var(draws) == pytest.approx(expect_var, rel=0.15)


def test_latent_is_standard_normal_and_raw_exposed():
    tau = LogNormalVariable(jnp.zeros(3), TAU_SD * jnp.ones(3), "tau")
    w = NonCenteredNormalVariable(0.0, tau, name="w", shape=(3,))
    assert w.raw.name == "w_raw"
    y = NormalVariable(BF.sum(w), 1.0, "y", observed=jnp.zeros(1))
    comp = ProbabilisticModel([y]).compiled()
    # the sampled z-space holds tau and w_raw only; w is deterministic
    assert set(comp.continuous_latent_names) == {"tau", "w_raw"}


def test_shape_inference_and_errors():
    w = NonCenteredNormalVariable(np.zeros((2, 3)), 1.0, name="a")
    assert w.raw.name == "a_raw"
    tau = LogNormalVariable(0.0, 1.0, "tau2")
    mu = NormalVariable(0.0, 1.0, "mu2")
    with pytest.raises(ValueError, match="shape"):
        NonCenteredNormalVariable(mu, tau, name="b")


def test_symbolic_scale_scalar_loc_requires_shape():
    # ADVICE r4 #1: a vector random scale with loc=0.0 must NOT silently
    # infer shape=() (one shared raw draw across all components)
    tau = LogNormalVariable(jnp.zeros(3), jnp.ones(3), "tau3")
    with pytest.raises(ValueError, match="shape= explicitly"):
        NonCenteredNormalVariable(0.0, tau, name="w3")
    # explicit shape=() remains expressible for a genuinely shared raw
    w = NonCenteredNormalVariable(0.0, tau, name="w3", shape=())
    assert w.raw.name == "w3_raw"
    # a non-scalar concrete operand still pins the shape without shape=
    w2 = NonCenteredNormalVariable(np.zeros(3), tau, name="w4")
    assert w2.raw.name == "w4_raw"


def test_ess_vars_unknown_name_raises():
    x = NormalVariable(0.0, 1.0, "x")
    y = NormalVariable(x, 1.0, "y", observed=jnp.zeros(3))
    with pytest.raises(ValueError, match="ess_vars"):
        sample(ProbabilisticModel([y]), kernel=NUTS(), num_samples=10,
               num_warmup=10, num_chains=2, key=jax.random.PRNGKey(0),
               ess_vars=["nope"])


@pytest.mark.slow
def test_posterior_matches_centered():
    dim = 2
    y_obs = jnp.asarray([2.0])
    centered, noncentered = _models(dim, y_obs)
    kw = dict(kernel=NUTS(), num_samples=800, num_warmup=600, num_chains=8,
              key=jax.random.PRNGKey(1), target_accept=0.95)
    rc = sample(centered, **kw)
    rn = sample(noncentered, ess_vars=["w", "tau"], **kw)
    wc = np.asarray(rc.samples["w"]).reshape(-1, dim)
    wn = np.asarray(rn.samples["w"]).reshape(-1, dim)
    assert np.allclose(wc.mean(0), wn.mean(0), atol=0.12)
    assert np.allclose(wc.std(0), wn.std(0), rtol=0.15)
    # the deterministic node got real diagnostics
    assert np.all(np.asarray(rn.diagnostics["ess"]["w"]) > 100)
    assert np.all(np.asarray(rn.diagnostics["r_hat"]["w"]) < 1.05)
