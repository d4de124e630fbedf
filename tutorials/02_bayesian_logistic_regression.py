# %% [markdown]
# # Bayesian logistic regression: minibatching and the fused fast path
#
# This tutorial mirrors the reference's logistic-regression example
# (BASELINE config #2) and shows the two TPU-first mechanisms behind it:
# the `RandomIndices`/`EmpiricalVariable` data-loader pattern for
# minibatched SVI, and the fused Pallas potential that the MCMC engines
# pick up automatically for GLM-shaped models.

# %%
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

# The axon TPU plugin reports default_backend()=="tpu" and ignores
# JAX_PLATFORMS, so TPU execution must be an explicit opt-in
if not bool(int(os.environ.get("TUTORIAL_TPU", "0"))):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

FAST = bool(int(os.environ.get("TUTORIAL_FAST", "0")))

# %% [markdown]
# ## 1. Data and model
#
# `w ~ N(0, I)`; `y_i ~ Bernoulli(sigmoid(x_i · w))`.  With
# `batch_size=...` the model wires a `RandomIndices` draw through two
# `EmpiricalVariable`s so every SVI step sees a fresh minibatch, and the
# likelihood rescales by N/B to stay unbiased.

# %%
from brancher_tpu.models.logistic_regression import (
    logistic_regression_model,
    make_logreg_data,
)

n_points, dim = (200, 8) if FAST else (1000, 16)
x, y, w_true = make_logreg_data(num_points=n_points, dim=dim, seed=0)
model_full = logistic_regression_model(x, y)              # full-data
model_mini = logistic_regression_model(x, y, batch_size=64)  # minibatched
print(model_mini)

# %% [markdown]
# ## 2. Minibatched SVI

# %%
from brancher_tpu.inference import perform_inference

res = perform_inference(
    model_mini,
    number_iterations=300 if FAST else 2000,
    number_samples=8,
    lr=0.02,
    key=jax.random.PRNGKey(0),
)
zs, _ = res.guide.sample_and_log_prob(res.params["q"], jax.random.PRNGKey(1), 400)
w_svi = np.asarray(zs["w"]).mean(0)
print(f"corr(SVI mean, true w) = {np.corrcoef(w_svi, w_true)[0, 1]:.3f}")

# %% [markdown]
# ## 3. NUTS with the auto-fused potential
#
# `sample()` numerically probes the compiled model; logistic regression
# matches the `bernoulli_logit` GLM family, so the potential's value AND
# gradient evaluate in one fused kernel (two MXU matmuls per leapfrog
# step across the whole chain block).  Models that don't match silently
# keep vmapped autodiff — the probe self-checks values and gradients
# against the autodiff density before it is trusted.

# %%
from brancher_tpu.inference import sample, NUTS

mcmc = sample(
    model_full,
    kernel=NUTS(max_depth=8),
    num_samples=300 if FAST else 1000,
    num_warmup=300 if FAST else 1000,
    num_chains=16,
    key=jax.random.PRNGKey(2),
)
comp = model_full.compiled()
fam = getattr(comp, "_fused_family_cache", None)
print("fused family:", None if fam is None else fam.family)
w_nuts = np.asarray(mcmc.samples["w"]).reshape(-1, dim).mean(0)
print(f"corr(NUTS mean, true w) = {np.corrcoef(w_nuts, w_true)[0, 1]:.3f}")
print(f"corr(NUTS mean, SVI mean) = {np.corrcoef(w_nuts, w_svi)[0, 1]:.3f}")

# %% [markdown]
# ## 4. Posterior predictive checks

# %%
ppc = mcmc.posterior_predictive(model_full, num_draws=50,
                                key=jax.random.PRNGKey(3))
acc = (np.asarray(ppc["y"]).mean(0).round() == y).mean()
print(f"posterior-predictive agreement with data: {acc:.2%}")

# %% [markdown]
# On a TPU chip this model is the benchmark headline: ~3.5M effective
# samples/sec with 1024 chains (see BASELINE.md), about 300× an
# eager-PyTorch CPU oracle charged for the same leapfrog trajectory.
