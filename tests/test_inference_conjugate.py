"""Analytic-posterior integration tests (SURVEY.md §4.2): Normal-Normal
conjugate model under SVI, HMC and NUTS — BASELINE config #1."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brancher_tpu import NormalVariable, ProbabilisticModel, DeterministicVariable
from brancher_tpu.inference import (
    perform_inference,
    ReverseKL,
    BlackBoxEstimator,
    PathwiseDerivativeEstimator,
    sample,
    HMC,
    NUTS,
)


def make_conjugate():
    """mu ~ N(0, 2); x_i ~ N(mu, 1), 20 obs.  Posterior closed form."""
    rng = np.random.RandomState(0)
    data = rng.normal(1.5, 1.0, size=20).astype(np.float32)
    prior_var, lik_var = 4.0, 1.0
    post_var = 1.0 / (1.0 / prior_var + len(data) / lik_var)
    post_mean = post_var * (np.sum(data) / lik_var)

    mu = NormalVariable(0.0, 2.0, "mu")
    x = NormalVariable(mu, 1.0, "x")
    x.observe(data)
    model = ProbabilisticModel([x])
    return model, post_mean, post_var


def test_svi_meanfield_matches_conjugate(key):
    model, post_mean, post_var = make_conjugate()
    res = perform_inference(
        model, number_iterations=2000, number_samples=32, lr=0.02, key=key
    )
    loc, var = res.guide.posterior_moments(res.params["q"])
    assert abs(float(loc[0]) - post_mean) < 0.05, (float(loc[0]), post_mean)
    assert abs(float(var[0]) - post_var) < 0.03, (float(var[0]), post_var)
    # ELBO decreased
    assert res.loss_curve[-1] < res.loss_curve[0]


def test_svi_blackbox_estimator(key):
    model, post_mean, post_var = make_conjugate()
    res = perform_inference(
        model,
        number_iterations=3000,
        number_samples=64,
        lr=0.02,
        key=key,
        inference_method=ReverseKL(BlackBoxEstimator()),
    )
    loc, var = res.guide.posterior_moments(res.params["q"])
    assert abs(float(loc[0]) - post_mean) < 0.15


def test_svi_dsl_guide(key):
    model, post_mean, post_var = make_conjugate()
    qloc = DeterministicVariable(jnp.asarray(0.0), "qloc", learnable=True)
    qscale_raw = DeterministicVariable(jnp.asarray(-1.0), "qscale_raw", learnable=True)
    import brancher_tpu.functions as BF

    qmu = NormalVariable(qloc, BF.exp(qscale_raw), "mu")
    q = ProbabilisticModel([qmu])
    model.set_posterior_model(q)
    res = perform_inference(
        model, number_iterations=2000, number_samples=32, lr=0.02, key=key
    )
    qp = res.params["q"]
    assert abs(float(qp["qloc"]) - post_mean) < 0.05
    assert abs(float(np.exp(2 * qp["qscale_raw"])) - post_var) < 0.05
    # reference API: posterior samples through the attached model
    post = model.get_posterior_sample_dict(500, key=jax.random.PRNGKey(7))
    assert abs(float(jnp.mean(post["mu"])) - post_mean) < 0.1


@pytest.mark.parametrize("kernel", [HMC(num_integration_steps=16), NUTS(max_depth=6)],
                         ids=["hmc", "nuts"])
def test_mcmc_matches_conjugate(kernel, key):
    model, post_mean, post_var = make_conjugate()
    res = sample(
        model, kernel=kernel, num_samples=800, num_warmup=500, num_chains=4, key=key
    )
    mu = res.samples["mu"]
    assert mu.shape[:2] == (4, 800)
    m = float(jnp.mean(mu))
    v = float(jnp.var(mu))
    # MC error ~ sqrt(post_var / ess); be generous
    assert abs(m - post_mean) < 0.05, (m, post_mean)
    assert abs(v - post_var) < 0.03, (v, post_var)
    assert float(res.diagnostics["mean_accept_prob"]) > 0.5
    assert int(res.diagnostics["num_divergences"]) == 0
    rhat = float(res.diagnostics["r_hat"]["mu"])
    assert rhat < 1.05
    ess = float(res.diagnostics["ess"]["mu"])
    assert ess > 200


def test_mcmc_sharded_chains(key):
    from brancher_tpu.parallel import chain_mesh

    model, post_mean, post_var = make_conjugate()
    mesh = chain_mesh()  # 8 fake CPU devices (conftest)
    res = sample(
        model,
        kernel=HMC(num_integration_steps=16),
        num_samples=400,
        num_warmup=400,
        num_chains=8,
        key=key,
        chain_method="shard_map",
        mesh=mesh,
    )
    m = float(jnp.mean(res.samples["mu"]))
    assert abs(m - post_mean) < 0.07, (m, post_mean)
