"""Particle-marginal MH: parameter inference in SSMs (ROADMAP r1 #8)."""
import pytest

pytestmark = pytest.mark.slow  # VERDICT r3 weak #8: fast gate runs -m 'not slow'
import jax
import jax.numpy as jnp
import numpy as np

from brancher_tpu.inference.pmmh import pmmh_sample
from brancher_tpu.inference.smc import StateSpace
from brancher_tpu.models.state_space import (

    LGSSMParams, kalman_filter, make_lgssm_data, lgssm_state_space,
)


def _make_ssm(theta):
    """LGSSM with unknown transition coefficient a = tanh(theta) (keeps
    |a|<1); all other parameters fixed at the truth."""
    a = jnp.tanh(theta[0])
    p = LGSSMParams()

    return StateSpace(
        init_sample=lambda k: jnp.sqrt(p.init_var) * jax.random.normal(k, ()),
        init_log_prob=lambda x: -0.5 * x * x / p.init_var,
        trans_sample=lambda k, xp, t: a * xp
        + jnp.sqrt(p.q) * jax.random.normal(k, ()),
        trans_log_prob=lambda x, xp, t: -0.5 * (x - a * xp) ** 2 / p.q,
        obs_log_prob=lambda y, x, t: -0.5 * (y - p.c * x) ** 2 / p.r
        - 0.5 * jnp.log(2 * jnp.pi * p.r),
    )


def _kalman_loglik_grid(ys):
    """Exact posterior over a on a grid via the Kalman likelihood."""
    grid = np.linspace(0.5, 0.995, 120)
    lls = []
    for a in grid:
        ll, _, _ = kalman_filter(ys, LGSSMParams(a=float(a)))
        lls.append(ll)
    lls = np.asarray(lls)
    # prior: theta ~ N(0, 1.5^2), a = tanh(theta) => density via change of var
    theta = np.arctanh(grid)
    logp = lls - 0.5 * (theta / 1.5) ** 2 - np.log1p(-grid**2)
    w = np.exp(logp - logp.max())
    w /= w.sum()
    mean_a = float((w * grid).sum())
    sd_a = float(np.sqrt((w * (grid - mean_a) ** 2).sum()))
    return mean_a, sd_a


def test_pmmh_recovers_transition_coefficient(key):
    params = LGSSMParams(a=0.85)
    _, ys = make_lgssm_data(length=60, params=params, seed=0)
    mean_a, sd_a = _kalman_loglik_grid(ys)

    res = pmmh_sample(
        _make_ssm,
        jnp.asarray(ys),
        log_prior=lambda th: -0.5 * jnp.sum((th / 1.5) ** 2),
        theta0=jnp.asarray([np.arctanh(0.7)], jnp.float32),
        num_samples=400,
        num_warmup=200,
        num_particles=128,
        num_chains=8,
        key=key,
    )
    a_draws = np.tanh(np.asarray(res.thetas)[..., 0].ravel())
    assert 0.05 < float(res.accept_rate) < 0.8, float(res.accept_rate)
    # posterior mean within ~2 posterior sds of the exact (Kalman) answer
    assert abs(a_draws.mean() - mean_a) < 2.5 * sd_a, (
        a_draws.mean(), mean_a, sd_a)
    # spread of the same order as the exact posterior sd
    assert 0.3 * sd_a < a_draws.std() < 3.5 * sd_a, (a_draws.std(), sd_a)


def test_pmmh_sharded_chains(key):
    """PMMH with theta chains sharded over the fake 8-device mesh: the
    sharded program compiles, adapts via the pmean consensus, and lands
    on the same (Kalman-exact) posterior as the single-device path."""
    from brancher_tpu.parallel import chain_mesh

    params = LGSSMParams(a=0.85)
    _, ys = make_lgssm_data(length=60, params=params, seed=0)
    mean_a, sd_a = _kalman_loglik_grid(ys)
    res = pmmh_sample(
        _make_ssm,
        jnp.asarray(ys),
        log_prior=lambda th: -0.5 * jnp.sum((th / 1.5) ** 2),
        theta0=jnp.asarray([np.arctanh(0.7)], jnp.float32),
        num_samples=300,
        num_warmup=150,
        num_particles=128,
        num_chains=8,
        key=key,
        mesh=chain_mesh(),
    )
    a_draws = np.tanh(np.asarray(res.thetas)[..., 0].ravel())
    assert res.thetas.shape == (8, 300, 1), res.thetas.shape
    assert 0.05 < float(res.accept_rate) < 0.8, float(res.accept_rate)
    assert abs(a_draws.mean() - mean_a) < 2.5 * sd_a, (
        a_draws.mean(), mean_a, sd_a)
    assert 0.3 * sd_a < a_draws.std() < 3.5 * sd_a, (a_draws.std(), sd_a)


def test_pmmh_sharded_both_2d_mesh(key):
    """shard='both' (ROADMAP r3 #8, the SMC²-scale layout): theta chains
    shard over a 2-device chain axis while each chain's particles split
    into island filters over a 4-device particle axis of the SAME 2x4
    mesh.  Compiles, adapts, and lands on the Kalman-exact posterior."""
    from brancher_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"chain": 2, "particle": 4})
    params = LGSSMParams(a=0.85)
    _, ys = make_lgssm_data(length=60, params=params, seed=0)
    mean_a, sd_a = _kalman_loglik_grid(ys)
    res = pmmh_sample(
        _make_ssm,
        jnp.asarray(ys),
        log_prior=lambda th: -0.5 * jnp.sum((th / 1.5) ** 2),
        theta0=jnp.asarray([np.arctanh(0.7)], jnp.float32),
        num_samples=300,
        num_warmup=150,
        num_particles=128,  # 32 per island on the 4-wide particle axis
        num_chains=8,  # 4 per shard on the 2-wide chain axis
        key=key,
        mesh=mesh,
        shard="both",
    )
    a_draws = np.tanh(np.asarray(res.thetas)[..., 0].ravel())
    assert res.thetas.shape == (8, 300, 1), res.thetas.shape
    assert 0.05 < float(res.accept_rate) < 0.8, float(res.accept_rate)
    assert abs(a_draws.mean() - mean_a) < 2.5 * sd_a, (
        a_draws.mean(), mean_a, sd_a)
    assert 0.3 * sd_a < a_draws.std() < 3.5 * sd_a, (a_draws.std(), sd_a)


def test_pmmh_sharded_particles(key):
    """shard='particle' (ROADMAP #7): each chain's particles split into
    per-device island filters whose unbiased estimates combine by
    log-mean-exp.  The sharded program compiles on the fake 8-device
    mesh and lands on the Kalman-exact posterior."""
    from brancher_tpu.parallel import particle_mesh

    params = LGSSMParams(a=0.85)
    _, ys = make_lgssm_data(length=60, params=params, seed=0)
    mean_a, sd_a = _kalman_loglik_grid(ys)
    res = pmmh_sample(
        _make_ssm,
        jnp.asarray(ys),
        log_prior=lambda th: -0.5 * jnp.sum((th / 1.5) ** 2),
        theta0=jnp.asarray([np.arctanh(0.7)], jnp.float32),
        num_samples=300,
        num_warmup=150,
        num_particles=256,  # 32 per island on the 8-device mesh
        num_chains=4,
        key=key,
        mesh=particle_mesh(),
        shard="particle",
    )
    a_draws = np.tanh(np.asarray(res.thetas)[..., 0].ravel())
    assert res.thetas.shape == (4, 300, 1), res.thetas.shape
    assert 0.05 < float(res.accept_rate) < 0.8, float(res.accept_rate)
    assert abs(a_draws.mean() - mean_a) < 2.5 * sd_a, (
        a_draws.mean(), mean_a, sd_a)
    assert 0.3 * sd_a < a_draws.std() < 3.5 * sd_a, (a_draws.std(), sd_a)
