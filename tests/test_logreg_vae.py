"""BASELINE configs #2 (logistic regression) and #5 (VAE): minibatch
semantics, amortized guide, ELBO monotonicity (SURVEY.md §4.2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brancher_tpu.models.logistic_regression import (
    logistic_regression_model,
    make_logreg_data,
)
from brancher_tpu.models.vae import VAEConfig, make_vae_data, vae_model
from brancher_tpu.inference import perform_inference, sample, NUTS

pytestmark = pytest.mark.slow  # VERDICT r3 weak #8: fast gate runs -m 'not slow'


def test_minibatch_scaling_is_unbiased(key):
    """E[minibatch log-lik * N/B] must equal the full-data log-lik."""
    x, y, _ = make_logreg_data(num_points=200, dim=4, seed=0)
    full = logistic_regression_model(x, y)
    mini = logistic_regression_model(x, y, batch_size=50)
    fcomp, mcomp = full.compiled(), mini.compiled()
    w = 0.3 * jnp.ones(4)

    lp_full = float(fcomp.log_likelihood_one(fcomp.initial_params, {"w": w}))
    # average many minibatch draws of the scaled likelihood
    loaders = tuple(mcomp.data_loader_names)

    def one(k):
        g = mcomp.sample_subgraph_one(mcomp.initial_params, k, loaders)
        return mcomp.log_likelihood_one(mcomp.initial_params, {"w": w, **g})

    lps = jax.vmap(one)(jax.random.split(key, 400))
    assert abs(float(jnp.mean(lps)) - lp_full) < 0.02 * abs(lp_full), (
        float(jnp.mean(lps)), lp_full)


def test_logreg_svi_vs_nuts(key):
    x, y, w_true = make_logreg_data(num_points=300, dim=4, seed=1)
    model = logistic_regression_model(x, y)
    nuts_res = sample(model, kernel=NUTS(max_depth=8), num_samples=400,
                      num_warmup=400, num_chains=2, key=key)
    w_nuts = np.asarray(jnp.mean(nuts_res.samples["w"], axis=(0, 1)))

    svi_res = perform_inference(model, number_iterations=1500,
                                number_samples=16, lr=0.02, key=key)
    loc, _ = svi_res.guide.posterior_moments(svi_res.params["q"])
    np.testing.assert_allclose(np.asarray(loc), w_nuts, atol=0.15)


def test_vae_elbo_decreases(key):
    data = make_vae_data(num_points=512, obs_dim=24, true_latent=3, seed=0)
    p_model, q_model = vae_model(data, VAEConfig(latent_dim=3, hidden_dim=16,
                                                 batch_size=64))
    res = perform_inference(p_model, number_iterations=400, number_samples=2,
                            lr=1e-3, key=key)
    # ELBO monotonicity in the large: compare first/last quarters
    q1 = np.mean(res.loss_curve[:100])
    q4 = np.mean(res.loss_curve[-100:])
    assert q4 < 0.9 * q1, (q1, q4)


def test_vae_posterior_sample_api(key):
    data = make_vae_data(num_points=256, obs_dim=16, seed=1)
    p_model, q_model = vae_model(data, VAEConfig(latent_dim=2, hidden_dim=8,
                                                 batch_size=32))
    perform_inference(p_model, number_iterations=50, number_samples=2,
                      lr=1e-3, key=key)
    post = p_model.get_posterior_sample_dict(3, key=key)
    assert post["z"].shape == (3, 32, 2)
    assert post["x"].shape[0] == 3


def test_sharded_elbo_matches_local(key):
    """Data-parallel ELBO over the 8-device mesh: loss gradient path
    equals the vmap path statistically (same model, similar final loss)."""
    from brancher_tpu.parallel import batch_mesh

    x, y, _ = make_logreg_data(num_points=200, dim=4, seed=2)
    m1 = logistic_regression_model(x, y)
    m2 = logistic_regression_model(x, y)
    r1 = perform_inference(m1, number_iterations=500, number_samples=16,
                           lr=0.05, key=key)
    r2 = perform_inference(m2, number_iterations=500, number_samples=16,
                           lr=0.05, key=key, mesh=batch_mesh())
    l1, _ = r1.guide.posterior_moments(r1.params["q"])
    l2, _ = r2.guide.posterior_moments(r2.params["q"])
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=0.15)


def test_maximum_likelihood_uses_observed_data(key):
    """Regression: ML must evaluate the likelihood at OBSERVED data, not
    at the model's own prior-predictive draws (which degenerates)."""
    import brancher_tpu.functions as BF
    from brancher_tpu import (
        BernoulliVariable, DeterministicVariable, ProbabilisticModel,
    )
    from brancher_tpu.inference import MaximumLikelihood

    x, y, w_true = make_logreg_data(num_points=400, dim=6, seed=3)
    w = DeterministicVariable(np.zeros(6, np.float32), "w", learnable=True)
    yv = BernoulliVariable(logits=BF.matmul(jnp.asarray(x), w), name="y")
    yv.observe(jnp.asarray(y))
    model = ProbabilisticModel([yv])
    res = perform_inference(
        model, number_iterations=600, number_samples=1, lr=0.1,
        inference_method=MaximumLikelihood(), key=key,
    )
    w_hat = np.asarray(res.params["p"]["w"])
    assert np.corrcoef(w_hat, w_true)[0, 1] > 0.9
