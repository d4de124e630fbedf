"""Marginalized Gaussian HMM: forward-algorithm exactness, NUTS over
emission parameters, forward-backward decoding."""
import pytest

pytestmark = pytest.mark.slow  # VERDICT r3 weak #8: fast gate runs -m 'not slow'
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


# -- generic-emission HMM (ROADMAP r2 #7) --------------------------------

def test_emission_hmm_matches_gaussian_hmm():
    from brancher_tpu.distributions import Normal
    from brancher_tpu.stochastic_processes import EmissionHMM

    ys, _ = _gen(t=40, seed=3)
    p = _params()
    ref = float(GaussianHMM(40).log_prob(jnp.asarray(ys), **p))
    gen = EmissionHMM(40, Normal())
    got = float(gen.log_prob(
        jnp.asarray(ys), init_logits=p["init_logits"],
        trans_logits=p["trans_logits"], emission_loc=p["locs"],
        emission_scale=p["scales"],
    ))
    assert abs(got - ref) < 1e-4, (got, ref)


def _gen_poisson(t=100, seed=4, rates=(1.0, 8.0)):
    rng = np.random.RandomState(seed)
    trans = np.asarray([[0.92, 0.08], [0.15, 0.85]])
    s = 0
    states, ys = [], []
    for _ in range(t):
        states.append(s)
        ys.append(rng.poisson(rates[s]))
        s = rng.choice(2, p=trans[s])
    return np.asarray(ys, np.float32), np.asarray(states)


def test_poisson_emission_hmm_bruteforce():
    from brancher_tpu.distributions import Poisson
    from brancher_tpu.stochastic_processes import EmissionHMM
    from scipy.stats import poisson as sp_poisson

    ys, _ = _gen_poisson(t=8)
    rates = np.asarray([1.0, 8.0])
    init = np.asarray([0.5, 0.5])
    trans = np.asarray([[0.92, 0.08], [0.15, 0.85]])
    hmm = EmissionHMM(8, Poisson())
    got = float(hmm.log_prob(
        jnp.asarray(ys), init_logits=jnp.log(jnp.asarray(init)),
        trans_logits=jnp.log(jnp.asarray(trans)),
        emission_rate=jnp.asarray(rates),
    ))
    total = -np.inf
    for path in itertools.product([0, 1], repeat=8):
        lp = np.log(init[path[0]]) + sp_poisson.logpmf(ys[0], rates[path[0]])
        for t in range(1, 8):
            lp += np.log(trans[path[t - 1], path[t]]) + sp_poisson.logpmf(
                ys[t], rates[path[t]])
        total = np.logaddexp(total, lp)
    assert abs(got - total) < 1e-3, (got, total)


def test_poisson_hmm_nuts_recovers_rates(key):
    from brancher_tpu import LogNormalVariable
    from brancher_tpu.distributions import Poisson
    from brancher_tpu.stochastic_processes import EmissionHMMVariable

    ys, _ = _gen_poisson(t=200, seed=5)
    rates = LogNormalVariable(jnp.zeros(2), 2.0 * jnp.ones(2), "rates")
    series = EmissionHMMVariable(
        len(ys), Poisson(),
        init_logits=jnp.zeros(2),
        trans_logits=jnp.log(jnp.asarray([[0.92, 0.08], [0.15, 0.85]])),
        rate=rates, name="y",
    )
    series.observe(jnp.asarray(ys))
    model = ProbabilisticModel([series])
    res = sample(model, kernel=NUTS(max_depth=7), num_samples=400,
                 num_warmup=400, num_chains=4, key=key)
    r_hat = np.sort(np.asarray(res.samples["rates"]).reshape(-1, 2),
                    axis=1).mean(0)
    assert abs(r_hat[0] - 1.0) < 0.4, r_hat
    assert abs(r_hat[1] - 8.0) < 1.2, r_hat


def test_emission_hmm_decoding_and_sampling(key):
    from brancher_tpu.distributions import Poisson
    from brancher_tpu.stochastic_processes import EmissionHMM

    ys, states = _gen_poisson(t=150, seed=6)
    hmm = EmissionHMM(150, Poisson())
    p = dict(init_logits=jnp.zeros(2),
             trans_logits=jnp.log(jnp.asarray([[0.92, 0.08], [0.15, 0.85]])),
             emission_rate=jnp.asarray([1.0, 8.0]))
    post = np.asarray(hmm.posterior_marginals(jnp.asarray(ys), **p))
    np.testing.assert_allclose(post.sum(-1), 1.0, rtol=1e-5)
    assert (post.argmax(-1) == states).mean() > 0.85

    draw = np.asarray(hmm.sample(key, **p))
    assert draw.shape == (150,)
    assert np.all(draw >= 0)


def test_emission_hmm_param_validation():
    from brancher_tpu.distributions import Poisson
    from brancher_tpu.stochastic_processes import EmissionHMMVariable

    try:
        EmissionHMMVariable(10, Poisson(), init_logits=jnp.zeros(2),
                            trans_logits=jnp.zeros((2, 2)),
                            wrong_name=1.0, name="y")
        assert False, "expected ValueError"
    except ValueError as e:
        assert "rate" in str(e) and "wrong_name" in str(e)


def test_viterbi_matches_bruteforce():
    """Viterbi decode == brute-force argmax of the joint over all K^T
    state paths (small T), and beats noisy observations on accuracy."""
    from brancher_tpu.distributions import Normal
    from brancher_tpu.stochastic_processes import EmissionHMM

    ys, states = _gen(t=8, seed=2)
    hmm = EmissionHMM(8, Normal())
    p = _params()
    em = dict(emission_loc=p["locs"], emission_scale=p["scales"])
    path = np.asarray(hmm.viterbi(
        ys, init_logits=p["init_logits"], trans_logits=p["trans_logits"], **em
    ))

    log_init = np.asarray(jax.nn.log_softmax(p["init_logits"]))
    log_trans = np.asarray(jax.nn.log_softmax(p["trans_logits"], axis=-1))

    def joint(ss):
        lp = log_init[ss[0]]
        for t in range(1, len(ss)):
            lp += log_trans[ss[t - 1], ss[t]]
        locs, scales = np.asarray(p["locs"]), np.asarray(p["scales"])
        for t, s in enumerate(ss):
            lp += float(
                -0.5 * ((ys[t] - locs[s]) / scales[s]) ** 2
                - np.log(scales[s]) - 0.5 * np.log(2 * np.pi)
            )
        return lp

    best = max(itertools.product(range(2), repeat=8), key=joint)
    assert path.tolist() == list(best), (path.tolist(), best)
    assert (path == states).mean() >= 0.75
