"""Unit tests: per-distribution log-prob/sample parity vs closed forms and
torch.distributions on CPU (SURVEY.md §4.1)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import brancher_tpu.distributions as D

N = 20_000
TOL = 0.05  # Monte-Carlo tolerance on moments at N=20k


def _mc_sample(dist, key, n=N, **params):
    keys = jax.random.split(key, n)
    return jax.vmap(lambda k: dist.sample(k, **params))(keys)


CASES = [
    (D.Normal(), dict(loc=1.5, scale=0.7), 1.5, 0.49),
    (D.LogNormal(), dict(loc=0.1, scale=0.3), math.exp(0.1 + 0.045), None),
    (D.Laplace(), dict(loc=-0.5, scale=1.2), -0.5, 2 * 1.44),
    (D.Uniform(), dict(low=-1.0, high=3.0), 1.0, 16 / 12),
    (D.Gamma(), dict(concentration=3.0, rate=2.0), 1.5, 0.75),
    (D.Exponential(), dict(rate=2.0), 0.5, 0.25),
    (D.Beta(), dict(alpha=2.0, beta=3.0), 0.4, 0.04),
    (D.StudentT(), dict(df=10.0, loc=0.0, scale=1.0), 0.0, 10 / 8),
    (D.Logistic(), dict(loc=0.0, scale=1.0), 0.0, math.pi**2 / 3),
    (D.HalfNormal(), dict(scale=1.0), math.sqrt(2 / math.pi), 1 - 2 / math.pi),
    (D.Poisson(), dict(rate=4.0), 4.0, 4.0),
    (D.Bernoulli(), dict(logits=0.8), jax.nn.sigmoid(0.8), None),
]


@pytest.mark.parametrize("dist,params,mean,var", CASES, ids=lambda c: repr(c))
def test_sample_moments(dist, params, mean, var, key):
    params = {k: jnp.asarray(v) for k, v in params.items()}
    s = _mc_sample(dist, key, **params)
    m = float(jnp.mean(s))
    assert abs(m - float(mean)) < TOL * max(1.0, abs(float(mean)) * 3), (m, mean)
    if var is not None:
        v = float(jnp.var(s))
        assert abs(v - float(var)) < 4 * TOL * max(1.0, float(var)), (v, var)


TORCH_CASES = [
    ("Normal", D.Normal(), dict(loc=0.3, scale=1.7), np.linspace(-3, 3, 7)),
    ("LogNormal", D.LogNormal(), dict(loc=0.2, scale=0.8), np.linspace(0.1, 4, 7)),
    ("Cauchy", D.Cauchy(), dict(loc=0.0, scale=2.0), np.linspace(-5, 5, 7)),
    ("Laplace", D.Laplace(), dict(loc=1.0, scale=0.5), np.linspace(-2, 3, 7)),
    ("StudentT", D.StudentT(), dict(df=4.0, loc=0.5, scale=1.5), np.linspace(-3, 3, 7)),
    ("Gamma", D.Gamma(), dict(concentration=2.5, rate=1.5), np.linspace(0.2, 5, 7)),
    ("Exponential", D.Exponential(), dict(rate=0.7), np.linspace(0.1, 5, 7)),
    ("Beta", D.Beta(), dict(alpha=2.0, beta=5.0), np.linspace(0.05, 0.95, 7)),
    ("Poisson", D.Poisson(), dict(rate=3.0), np.arange(0, 7).astype(float)),
    ("Uniform", D.Uniform(), dict(low=-1.0, high=2.0), np.linspace(-0.5, 1.5, 5)),
]


@pytest.mark.parametrize("tname,dist,params,values", TORCH_CASES, ids=[c[0] for c in TORCH_CASES])
def test_log_prob_vs_torch(tname, dist, params, values):
    torch = pytest.importorskip("torch")
    td = torch.distributions
    mapping = {
        "Normal": lambda p: td.Normal(p["loc"], p["scale"]),
        "LogNormal": lambda p: td.LogNormal(p["loc"], p["scale"]),
        "Cauchy": lambda p: td.Cauchy(p["loc"], p["scale"]),
        "Laplace": lambda p: td.Laplace(p["loc"], p["scale"]),
        "StudentT": lambda p: td.StudentT(p["df"], p["loc"], p["scale"]),
        "Gamma": lambda p: td.Gamma(p["concentration"], p["rate"]),
        "Exponential": lambda p: td.Exponential(p["rate"]),
        "Beta": lambda p: td.Beta(p["alpha"], p["beta"]),
        "Poisson": lambda p: td.Poisson(p["rate"]),
        "Uniform": lambda p: td.Uniform(p["low"], p["high"]),
    }
    tp = {k: torch.tensor(v, dtype=torch.float64) for k, v in params.items()}
    ref = mapping[tname](tp).log_prob(torch.tensor(values, dtype=torch.float64)).numpy()
    jp = {k: jnp.asarray(v) for k, v in params.items()}
    ours = np.asarray(dist.log_prob(jnp.asarray(values, jnp.float32), **jp))
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=1e-3)


def test_bernoulli_binomial_logprob():
    b = D.Bernoulli()
    p = 0.3
    lg = jnp.asarray(math.log(p / (1 - p)))
    np.testing.assert_allclose(float(b.log_prob(jnp.asarray(1), logits=lg)), math.log(p), rtol=1e-5)
    np.testing.assert_allclose(float(b.log_prob(jnp.asarray(0), logits=lg)), math.log(1 - p), rtol=1e-5)

    binom = D.Binomial()
    # Binomial(5, 0.4) P(X=2) = C(5,2) 0.4^2 0.6^3
    expect = math.log(10 * 0.4**2 * 0.6**3)
    got = float(binom.log_prob(jnp.asarray(2), total_count=5, probs=jnp.asarray(0.4)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_categorical(key):
    c = D.Categorical()
    logits = jnp.asarray([0.1, 1.0, -0.5])
    s = jax.vmap(lambda k: c.sample(k, logits=logits))(jax.random.split(key, 8000))
    freq = jnp.bincount(s, length=3) / 8000
    np.testing.assert_allclose(np.asarray(freq), np.asarray(jax.nn.softmax(logits)), atol=0.03)
    lp = c.log_prob(jnp.asarray(1), logits=logits)
    np.testing.assert_allclose(float(lp), float(jax.nn.log_softmax(logits)[1]), rtol=1e-5)


def test_mvn(key):
    mvn = D.MultivariateNormal()
    loc = jnp.asarray([1.0, -1.0])
    cov = jnp.asarray([[2.0, 0.5], [0.5, 1.0]])
    s = jax.vmap(lambda k: mvn.sample(k, loc=loc, covariance_matrix=cov))(
        jax.random.split(key, 30_000)
    )
    np.testing.assert_allclose(np.mean(np.asarray(s), axis=0), np.asarray(loc), atol=0.05)
    np.testing.assert_allclose(np.cov(np.asarray(s).T), np.asarray(cov), atol=0.1)
    # log prob vs scipy formula
    x = jnp.asarray([0.5, 0.2])
    diff = np.asarray(x - loc)
    covn = np.asarray(cov)
    expect = (
        -0.5 * diff @ np.linalg.inv(covn) @ diff
        - 0.5 * np.log(np.linalg.det(covn))
        - np.log(2 * np.pi)
    )
    got = float(mvn.log_prob(x, loc=loc, covariance_matrix=cov))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_dirichlet(key):
    d = D.Dirichlet()
    conc = jnp.asarray([2.0, 3.0, 5.0])
    s = jax.vmap(lambda k: d.sample(k, concentration=conc))(jax.random.split(key, 20_000))
    np.testing.assert_allclose(
        np.mean(np.asarray(s), axis=0), np.asarray(conc) / 10.0, atol=0.02
    )
    x = jnp.asarray([0.2, 0.3, 0.5])
    from scipy.stats import dirichlet as sp_dir

    expect = sp_dir.logpdf(np.asarray(x), np.asarray(conc))
    np.testing.assert_allclose(float(d.log_prob(x, concentration=conc)), expect, rtol=1e-5)


def test_concrete_simplex(key):
    c = D.Concrete()
    logits = jnp.asarray([0.5, -0.5, 1.0])
    s = jax.vmap(lambda k: c.sample(k, temperature=jnp.asarray(0.5), logits=logits))(
        jax.random.split(key, 100)
    )
    np.testing.assert_allclose(np.asarray(jnp.sum(s, -1)), np.ones(100), rtol=1e-5)
    lp = c.log_prob(s[0], temperature=jnp.asarray(0.5), logits=logits)
    assert np.isfinite(float(lp))


def test_reparameterized_gradients():
    """Pathwise gradient of E[x] wrt loc must be ~1 for Normal."""
    dist = D.Normal()

    def mean_est(loc):
        keys = jax.random.split(jax.random.PRNGKey(1), 500)
        s = jax.vmap(lambda k: dist.sample(k, loc=loc, scale=jnp.asarray(1.0)))(keys)
        return jnp.mean(s)

    g = jax.grad(mean_est)(jnp.asarray(0.5))
    np.testing.assert_allclose(float(g), 1.0, rtol=1e-5)


def test_truncated_normal_vs_scipy(key):
    from scipy.stats import truncnorm

    t = D.TruncatedNormal()
    params = dict(loc=jnp.asarray(0.5), scale=jnp.asarray(1.2),
                  low=jnp.asarray(-1.0), high=jnp.asarray(2.0))
    a, b = (-1.0 - 0.5) / 1.2, (2.0 - 0.5) / 1.2
    ref = truncnorm(a, b, 0.5, 1.2)
    s = _mc_sample(t, key, **params)
    assert abs(float(jnp.mean(s)) - ref.mean()) < 0.02
    assert abs(float(jnp.var(s)) - ref.var()) < 0.02
    assert float(jnp.min(s)) >= -1.0 and float(jnp.max(s)) <= 2.0
    lp = float(t.log_prob(jnp.asarray(0.3), **params))
    np.testing.assert_allclose(lp, ref.logpdf(0.3), rtol=1e-4)
    assert float(t.log_prob(jnp.asarray(5.0), **params)) == -np.inf


@pytest.mark.slow
def test_plate_shape_on_event_distributions(key):
    """VERDICT r1 weak #9: plate_shape must work for event-valued
    distributions (MVN, Dirichlet) — iid copies across the plate."""
    from brancher_tpu import ProbabilisticModel
    from brancher_tpu.standard_variables import (
        DirichletVariable, MultivariateNormalVariable,
    )

    mvn = MultivariateNormalVariable(
        jnp.zeros(3), covariance_matrix=jnp.eye(3) * 4.0, name="f",
        plate_shape=(7,),
    )
    dir_v = DirichletVariable(jnp.asarray([2.0, 2.0, 2.0]), "w",
                              plate_shape=(5,))
    m = ProbabilisticModel([mvn, dir_v])
    s = m.get_sample_dict(4, key=key)
    assert s["f"].shape == (4, 7, 3)
    assert s["w"].shape == (4, 5, 3)
    np.testing.assert_allclose(np.asarray(s["w"]).sum(-1), 1.0, rtol=1e-5)
    lp = m.calculate_log_probability({k: v for k, v in s.items()})
    assert lp.shape == (4,) and np.all(np.isfinite(np.asarray(lp)))
    # iid across the plate: per-plate covariance ~ the common one
    big = m.get_sample_dict(4000, key=jax.random.PRNGKey(1))
    f = np.asarray(big["f"])
    assert abs(f[:, 0].var() - 4.0) < 0.5
    assert abs(f[:, 3].var() - 4.0) < 0.5
