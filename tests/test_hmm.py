"""Marginalized Gaussian HMM: forward-algorithm exactness, NUTS over
emission parameters, forward-backward decoding."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from brancher_tpu import NormalVariable, ProbabilisticModel
from brancher_tpu.inference import NUTS, sample
from brancher_tpu.stochastic_processes import (
    GaussianHMM, HMMVariable, hmm_posterior_marginals,
)


def _params(k=2):
    return dict(
        init_logits=jnp.log(jnp.asarray([0.6, 0.4])),
        trans_logits=jnp.log(jnp.asarray([[0.9, 0.1], [0.2, 0.8]])),
        locs=jnp.asarray([-2.0, 2.0]),
        scales=jnp.asarray([0.7, 0.7]),
    )


def _gen(t=60, seed=0):
    rng = np.random.RandomState(seed)
    trans = np.asarray([[0.9, 0.1], [0.2, 0.8]])
    locs, scale = np.asarray([-2.0, 2.0]), 0.7
    s = rng.choice(2, p=[0.6, 0.4])
    states, ys = [], []
    for _ in range(t):
        states.append(s)
        ys.append(locs[s] + scale * rng.randn())
        s = rng.choice(2, p=trans[s])
    return np.asarray(ys, np.float32), np.asarray(states)


def test_forward_algorithm_matches_bruteforce():
    ys, _ = _gen(t=8)
    hmm = GaussianHMM(8)
    p = _params()
    got = float(hmm.log_prob(jnp.asarray(ys), **p))

    init = np.asarray(jax.nn.softmax(p["init_logits"]))
    trans = np.asarray(jax.nn.softmax(p["trans_logits"], axis=-1))
    locs, scales = np.asarray(p["locs"]), np.asarray(p["scales"])

    def emis(y, s):
        return (
            -0.5 * ((y - locs[s]) / scales[s]) ** 2
            - np.log(scales[s]) - 0.5 * np.log(2 * np.pi)
        )

    total = -np.inf
    for path in itertools.product([0, 1], repeat=8):
        lp = np.log(init[path[0]]) + emis(ys[0], path[0])
        for t in range(1, 8):
            lp += np.log(trans[path[t - 1], path[t]]) + emis(ys[t], path[t])
        total = np.logaddexp(total, lp)
    assert abs(got - total) < 1e-3, (got, total)


def test_hmm_nuts_recovers_emission_means(key):
    """NUTS over the emission locations with states marginalized — the
    discrete chain never enters the sampler."""
    ys, _ = _gen(t=120, seed=1)
    locs = NormalVariable(jnp.zeros(2), 5.0 * jnp.ones(2), "locs")
    series = HMMVariable(
        len(ys),
        init_logits=jnp.zeros(2),
        trans_logits=jnp.log(jnp.asarray([[0.9, 0.1], [0.2, 0.8]])),
        locs=locs,
        scales=jnp.asarray([0.7, 0.7]),
        name="y",
    )
    series.observe(jnp.asarray(ys))
    model = ProbabilisticModel([series])
    res = sample(model, kernel=NUTS(max_depth=7), num_samples=400,
                 num_warmup=400, num_chains=4, key=key)
    locs_hat = np.sort(np.asarray(res.samples["locs"]).reshape(-1, 2), axis=1).mean(0)
    assert abs(locs_hat[0] + 2.0) < 0.25, locs_hat
    assert abs(locs_hat[1] - 2.0) < 0.25, locs_hat
    assert float(res.diagnostics["num_divergences"]) == 0


def test_forward_backward_decoding():
    ys, states = _gen(t=80, seed=2)
    post = np.asarray(hmm_posterior_marginals(jnp.asarray(ys), **_params()))
    assert post.shape == (80, 2)
    np.testing.assert_allclose(post.sum(-1), 1.0, rtol=1e-5)
    acc = (post.argmax(-1) == states).mean()
    assert acc > 0.9, acc
