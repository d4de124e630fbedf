"""DSL + compiler tests: link/broadcast semantics, golden-value parity with
hand-written JAX (SURVEY.md §4.1 "graph-compiler golden tests")."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import brancher_tpu.functions as BF
from brancher_tpu import (
    DeterministicVariable,
    NormalVariable,
    LogNormalVariable,
    BernoulliVariable,
    ProbabilisticModel,
)


def test_construction_and_parents():
    mu = NormalVariable(0.0, 1.0, "mu")
    sigma = LogNormalVariable(0.0, 0.5, "sigma")
    x = NormalVariable(mu, sigma, "x")
    assert set(p.name for p in x.parents) == {"mu", "sigma"}

    # expressions in parameter positions
    y = NormalVariable(BF.exp(mu) + 2.0 * sigma, 1.0, "y")
    assert set(p.name for p in y.parents) == {"mu", "sigma"}


def test_operator_overloading_builds_links():
    mu = NormalVariable(0.0, 1.0, "mu")
    link = 2.0 * mu + 1.0
    val = link.fn({"mu": jnp.asarray(3.0)}, None)
    assert float(val) == 7.0

    link2 = BF.exp(mu)[()]
    # getitem with empty tuple is identity on scalars
    assert np.isclose(float(link2.fn({"mu": jnp.asarray(0.0)}, None)), 1.0)


def test_ancestral_sampling_shapes(key):
    mu = NormalVariable(0.0, 1.0, "mu")
    x = NormalVariable(mu, 0.1, "x", plate_shape=(5,))
    model = ProbabilisticModel([x])
    s = model.get_sample_dict(7, key=key)
    assert s["mu"].shape == (7,)
    assert s["x"].shape == (7, 5)


def test_sampling_matches_hand_written_jax(key):
    """Golden test: compiled sampler must equal a hand-rolled JAX program
    using the same key-folding discipline."""
    mu = NormalVariable(1.0, 2.0, "mu")
    x = NormalVariable(BF.exp(mu), 0.5, "x")
    model = ProbabilisticModel([x])
    comp = model.compiled()
    vals = comp.sample_one(comp.initial_params, key)

    # hand-written: order is [mu, x]; fold_in indices follow topo order
    k_mu = jax.random.fold_in(key, 0)
    k_x = jax.random.fold_in(key, 1)
    mu_v = 1.0 + 2.0 * jax.random.normal(k_mu, ())
    x_v = jnp.exp(mu_v) + 0.5 * jax.random.normal(k_x, ())
    np.testing.assert_allclose(float(vals["mu"]), float(mu_v), rtol=1e-6)
    np.testing.assert_allclose(float(vals["x"]), float(x_v), rtol=1e-6)


def test_log_prob_matches_hand_written(key):
    mu = NormalVariable(0.0, 1.0, "mu")
    x = NormalVariable(mu, 0.5, "x")
    model = ProbabilisticModel([x])
    comp = model.compiled()

    vals = {"mu": jnp.asarray(0.3), "x": jnp.asarray(-0.2)}
    lp = comp.log_prob_one(comp.initial_params, vals)

    def norm_lp(v, loc, scale):
        return -0.5 * ((v - loc) / scale) ** 2 - jnp.log(scale) - 0.5 * jnp.log(2 * jnp.pi)

    expect = norm_lp(0.3, 0.0, 1.0) + norm_lp(-0.2, 0.3, 0.5)
    np.testing.assert_allclose(float(lp), float(expect), rtol=1e-4, atol=1e-4)


def test_observation_and_latents():
    mu = NormalVariable(0.0, 1.0, "mu")
    x = NormalVariable(mu, 0.5, "x")
    model = ProbabilisticModel([x])
    data = jnp.asarray([0.1, 0.2, 0.3])
    x.observe(data)
    comp = model.compiled()
    assert comp.latent_names == ["mu"]
    assert comp.observed_names == ["x"]
    lp = comp.log_prob_one(comp.initial_params, {"mu": jnp.asarray(0.0)})
    # 3 data points, each Normal(0, 0.5)
    expect = np.sum(
        -0.5 * (np.asarray(data) / 0.5) ** 2 - np.log(0.5) - 0.5 * np.log(2 * np.pi)
    ) + (-0.5 * np.log(2 * np.pi))
    np.testing.assert_allclose(float(lp), expect, rtol=1e-4, atol=1e-4)

    x.unobserve()
    comp2 = model.compiled()
    assert comp2.latent_names == ["mu", "x"]


def test_learnable_deterministic_param():
    w = DeterministicVariable(jnp.asarray(2.0), "w", learnable=True)
    x = NormalVariable(w, 1.0, "x")
    model = ProbabilisticModel([x])
    comp = model.compiled()
    assert "w" in comp.initial_params
    # changing the param changes the sampled mean deterministically
    v1 = comp.sample_one({"w": jnp.asarray(0.0)}, jax.random.PRNGKey(3))
    v2 = comp.sample_one({"w": jnp.asarray(10.0)}, jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(v2["x"] - v1["x"]), 10.0, rtol=1e-5)


def test_unconstrained_log_density(key):
    """z-space density includes the Jacobian: check against direct formula
    for a LogNormal latent."""
    s = LogNormalVariable(0.0, 1.0, "s")
    x = NormalVariable(0.0, s, "x")
    x.observe(jnp.asarray([1.0, -1.0]))
    model = ProbabilisticModel([x])
    comp = model.compiled()
    z = {"s": jnp.asarray(0.4)}
    lp = comp.log_density_z(comp.initial_params, z)

    sig = np.exp(0.4)

    def norm_lp(v, loc, scale):
        return -0.5 * ((v - loc) / scale) ** 2 - np.log(scale) - 0.5 * np.log(2 * np.pi)

    # LogNormal(0,1) density at sig plus jacobian z, plus data terms
    expect = (
        norm_lp(0.4, 0.0, 1.0) - 0.4  # lognormal lp at e^z: N(log s) - log s
        + 0.4  # + log|d e^z / dz| = z
        + norm_lp(1.0, 0.0, sig)
        + norm_lp(-1.0, 0.0, sig)
    )
    np.testing.assert_allclose(float(lp), expect, rtol=1e-4, atol=1e-4)

    # constrain/unconstrain round trip
    vals = comp.constrain(comp.initial_params, z)
    np.testing.assert_allclose(float(vals["s"]), sig, rtol=1e-6)
    z2 = comp.unconstrain(comp.initial_params, {"s": vals["s"]})
    np.testing.assert_allclose(float(z2["s"]), 0.4, rtol=1e-6)


def test_flax_module_bridge(key):
    nn = pytest.importorskip("flax.linen")

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3)(x)

    z = NormalVariable(jnp.zeros(4), jnp.ones(4), "z")
    net = BF.BrancherFunction(MLP(), name="mlp")
    x = NormalVariable(net(z), 1.0, "x")
    model = ProbabilisticModel([x])
    comp = model.compiled()
    assert "mlp__params" in comp.initial_params
    s = model.get_sample_dict(3, key=key, params=comp.initial_params)
    assert s["x"].shape == (3, 3)


def test_pandas_roundtrip(key):
    mu = NormalVariable(0.0, 1.0, "mu")
    model = ProbabilisticModel([mu])
    df = model.get_sample(5, key=key)
    assert list(df.columns) == ["mu"]
    lp = model.calculate_log_probability(df)
    assert lp.shape == (5,)


def test_posterior_model_by_name(key):
    mu = NormalVariable(0.0, 1.0, "mu")
    x = NormalVariable(mu, 0.5, "x")
    x.observe(jnp.asarray([1.0]))
    p = ProbabilisticModel([x])

    qmu = NormalVariable(
        DeterministicVariable(jnp.asarray(0.8), "qm", learnable=True),
        0.1,
        "mu",
    )
    q = ProbabilisticModel([qmu])
    p.set_posterior_model(q)
    post = p.get_posterior_sample_dict(6, key=key)
    assert post["mu"].shape == (6,)
    assert abs(float(jnp.mean(post["mu"])) - 0.8) < 0.2


def test_observation_link_closure(key):
    """Regression (VERDICT r1 weak #3): variables reached only through an
    observation link (the data-loader pattern) must be part of the model —
    visible via get_variable, counted in the ancestral closure, and
    version-tracked so re-observation invalidates the compile cache."""
    from brancher_tpu import EmpiricalVariable, RandomIndices

    data_a = jnp.arange(12.0).reshape(6, 2)
    idx = RandomIndices(6, 3, "idx")
    xb = EmpiricalVariable(data_a, name="xb", indices=idx)
    x = NormalVariable(jnp.zeros((3, 2)), jnp.ones((3, 2)), "x")
    x.observe(xb)
    model = ProbabilisticModel([x])

    # data-loader variables appear in the model
    assert model.get_variable("xb") is xb
    names = [v.name for v in model.variables]
    assert "xb" in names and "idx" in names
    assert {v.name for v in model.observed_variables} == {"x"}

    comp_a = model.compiled()
    # swapping the dataset (re-observe with a fresh loader) must refresh
    # the compiled closure — the old cache entry is stale
    data_b = -jnp.arange(12.0).reshape(6, 2)
    idx2 = RandomIndices(6, 3, "idx")
    xb2 = EmpiricalVariable(data_b, name="xb", indices=idx2)
    model.observe({"x": xb2})
    assert model.get_variable("xb") is xb2
    comp_b = model.compiled()
    assert comp_b is not comp_a

    s = model.get_sample_dict(4, key=key)
    assert jnp.all(s["xb"] <= 0.0)
