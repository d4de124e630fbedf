"""Marginalized finite mixtures: log-prob correctness and GMM inference
(label-switching-aware)."""
import jax
import jax.numpy as jnp
import numpy as np

import brancher_tpu.distributions as D
from brancher_tpu import MixtureVariable, NormalVariable, ProbabilisticModel
from brancher_tpu.inference import NUTS, sample


def test_mixture_log_prob_closed_form():
    m = D.Mixture(D.Normal())
    x = jnp.asarray(0.5)
    probs = jnp.asarray([0.3, 0.7])
    loc = jnp.asarray([-2.0, 2.0])
    scale = jnp.asarray([0.5, 0.5])
    lp = float(m.log_prob(x, probs=probs, loc=loc, scale=scale))

    def npdf(v, mu, s):
        return np.exp(-0.5 * ((v - mu) / s) ** 2) / (s * np.sqrt(2 * np.pi))

    expect = np.log(0.3 * npdf(0.5, -2, 0.5) + 0.7 * npdf(0.5, 2, 0.5))
    np.testing.assert_allclose(lp, expect, rtol=1e-4)


def test_mixture_sampling_proportions(key):
    m = D.Mixture(D.Normal())
    s = jax.vmap(
        lambda k: m.sample(k, probs=jnp.asarray([0.3, 0.7]),
                           loc=jnp.asarray([-2.0, 2.0]), scale=0.3)
    )(jax.random.split(key, 8000))
    frac_hi = float(jnp.mean(s > 0))
    assert abs(frac_hi - 0.7) < 0.03


def test_gmm_nuts_recovers_means(key):
    """2-component GMM: each chain must find the (±2) modes up to label
    permutation (sorted per-chain means)."""
    rng = np.random.RandomState(0)
    data = np.concatenate(
        [rng.normal(-2, 0.5, 150), rng.normal(2.0, 0.5, 350)]
    ).astype(np.float32)
    mus = NormalVariable(jnp.zeros(2), 5.0 * jnp.ones(2), "mus")
    x = MixtureVariable(D.Normal(), probs=jnp.asarray([0.3, 0.7]),
                        loc=mus, scale=0.5, name="x")
    x.observe(data)
    model = ProbabilisticModel([x])
    res = sample(model, kernel=NUTS(max_depth=7), num_samples=300,
                 num_warmup=400, num_chains=8, key=key)
    per_chain = np.sort(np.asarray(jnp.mean(res.samples["mus"], axis=1)), axis=1)
    np.testing.assert_allclose(per_chain[:, 0], -1.94, atol=0.15)
    np.testing.assert_allclose(per_chain[:, 1], 1.96, atol=0.15)
