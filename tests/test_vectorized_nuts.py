"""Vectorized (chain-batched) NUTS: exactness vs analytic targets and
agreement with the general per-chain engine."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brancher_tpu.inference.vectorized_nuts import nuts_batched
from brancher_tpu.inference import sample, NUTS, HMC


def test_gaussian_target_moments(key):
    """N(1, 2 I) target: exact mean/variance recovery."""

    def vg(z):
        return -0.25 * jnp.sum((z - 1.0) ** 2, -1), -0.5 * (z - 1.0)

    z0 = jax.random.normal(key, (64, 3))
    res = jax.jit(
        lambda k: nuts_batched(vg, z0, 300, 500, k, max_depth=8)
    )(jax.random.PRNGKey(1))
    assert abs(float(jnp.mean(res.samples)) - 1.0) < 0.05
    assert abs(float(jnp.var(res.samples)) - 2.0) < 0.15
    assert 0.6 < float(jnp.mean(res.accept_prob)) <= 1.0


def test_correlated_gaussian(key):
    """Anisotropic target exercises the mass adaptation."""
    scales = jnp.asarray([0.1, 1.0, 10.0])

    def vg(z):
        val = -0.5 * jnp.sum((z / scales) ** 2, -1)
        return val, -z / scales**2

    z0 = 0.1 * jax.random.normal(key, (64, 3))
    res = jax.jit(
        lambda k: nuts_batched(vg, z0, 500, 500, k, max_depth=9)
    )(jax.random.PRNGKey(2))
    var = jnp.var(res.samples.reshape(-1, 3), axis=0)
    np.testing.assert_allclose(np.asarray(var), np.asarray(scales) ** 2,
                               rtol=0.3)


def test_vectorized_default_matches_vmap_engine(key):
    """sample() default (vectorized) must agree with chain_method='vmap'."""
    from brancher_tpu.models.conjugate import conjugate_normal_model

    model, truth = conjugate_normal_model(num_obs=20)
    r_vec = sample(model, kernel=NUTS(max_depth=6), num_samples=600,
                   num_warmup=400, num_chains=8, key=key)
    r_gen = sample(model, kernel=NUTS(max_depth=6), num_samples=600,
                   num_warmup=400, num_chains=4, key=key, chain_method="vmap")
    m_v = float(jnp.mean(r_vec.samples["mu"]))
    m_g = float(jnp.mean(r_gen.samples["mu"]))
    assert abs(m_v - truth["post_mean"]) < 0.05
    assert abs(m_v - m_g) < 0.05
    v_v = float(jnp.var(r_vec.samples["mu"]))
    assert abs(v_v - truth["post_var"]) < 0.03


def test_vectorized_sharded(key):
    from brancher_tpu.parallel import chain_mesh
    from brancher_tpu.models.conjugate import conjugate_normal_model

    model, truth = conjugate_normal_model(num_obs=20)
    res = sample(model, kernel=NUTS(max_depth=6), num_samples=400,
                 num_warmup=400, num_chains=16, key=key, mesh=chain_mesh())
    assert res.samples["mu"].shape[:2] == (16, 400)
    assert abs(float(jnp.mean(res.samples["mu"])) - truth["post_mean"]) < 0.06


def test_vectorized_hmc_kernel(key):
    from brancher_tpu.models.conjugate import conjugate_normal_model

    model, truth = conjugate_normal_model(num_obs=20)
    res = sample(model, kernel=HMC(num_integration_steps=16), num_samples=600,
                 num_warmup=400, num_chains=8, key=key)
    assert abs(float(jnp.mean(res.samples["mu"])) - truth["post_mean"]) < 0.05
    assert abs(float(jnp.var(res.samples["mu"])) - truth["post_var"]) < 0.03


def test_constrained_latents_through_vectorized(key):
    """LogNormal latent (exp transform) via the vectorized engine."""
    from brancher_tpu import LogNormalVariable, NormalVariable, ProbabilisticModel

    s = LogNormalVariable(0.0, 0.5, "s")
    x = NormalVariable(0.0, s, "x")
    x.observe(np.random.RandomState(0).normal(0, 1.3, 100).astype(np.float32))
    model = ProbabilisticModel([x])
    res = sample(model, kernel=NUTS(max_depth=7), num_samples=500,
                 num_warmup=500, num_chains=8, key=key)
    s_mean = float(jnp.mean(res.samples["s"]))
    assert 1.1 < s_mean < 1.5, s_mean  # concentrates near sample std
    assert np.all(np.asarray(res.samples["s"]) > 0)
