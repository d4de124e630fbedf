# %% [markdown]
# # Getting started with brancher_tpu
#
# `brancher_tpu` is a TPU-native probabilistic programming framework with
# the symbolic random-variable DSL of
# [Brancher](https://github.com/LucaAmbrogioni/Brancher): you build models
# by composing variables with ordinary Python arithmetic, and every
# inference engine (SVI, NUTS/HMC, SMC, particle methods) consumes the
# SAME model, compiled once into pure JAX functions.
#
# This tutorial covers the core workflow: define → observe → infer →
# inspect, on a conjugate model where every answer is known in closed
# form.

# %%
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

# The axon TPU plugin reports default_backend()=="tpu" and ignores
# JAX_PLATFORMS, so TPU execution must be an explicit opt-in
if not bool(int(os.environ.get("TUTORIAL_TPU", "0"))):
    jax.config.update("jax_platforms", "cpu")  # CI mode: fake 8-CPU mesh
import jax.numpy as jnp
import numpy as np

FAST = bool(int(os.environ.get("TUTORIAL_FAST", "0")))

# %% [markdown]
# ## 1. Building a model
#
# Variables compose with `+ - * / @ **` and the lifted math namespace
# `BF.*`; parents are discovered automatically.  Nothing executes yet —
# the graph is data, lowered to JAX closures on first use.

# %%
from brancher_tpu import NormalVariable, LogNormalVariable, ProbabilisticModel
import brancher_tpu.functions as BF

mu = NormalVariable(0.0, 2.0, "mu")            # latent mean
sigma = LogNormalVariable(0.0, 0.25, "sigma")  # latent noise scale
x = NormalVariable(mu, sigma, "x", plate_shape=(30,))  # 30 iid points

rng = np.random.RandomState(0)
data = (2.0 + 0.4 * rng.randn(30)).astype(np.float32)
x.observe(data)

model = ProbabilisticModel([x])
print(model)

# %% [markdown]
# ## 2. Forward sampling
#
# `get_sample` returns a tidy pandas DataFrame (the reference API);
# `get_sample_dict` returns raw arrays.

# %%
df = model.get_sample(5, key=jax.random.PRNGKey(0))
print(df[["mu", "sigma"]].round(3))

# %% [markdown]
# ## 3. Stochastic variational inference
#
# With no guide specified, `perform_inference` builds an automatic
# mean-field Normal over the unconstrained latents and minimizes the
# negative ELBO with reparameterized gradients — one jitted `lax.scan`
# for the whole training loop.

# %%
from brancher_tpu.inference import perform_inference

res = perform_inference(
    model,
    number_iterations=200 if FAST else 1500,
    number_samples=16,
    lr=0.05,
    key=jax.random.PRNGKey(1),
)
zs, _ = res.guide.sample_and_log_prob(res.params["q"], jax.random.PRNGKey(2), 500)
print(f"SVI posterior:  mu = {float(zs['mu'].mean()):.3f} "
      f"± {float(zs['mu'].std()):.3f}")

# %% [markdown]
# ## 4. NUTS
#
# The same model runs Hamiltonian Monte Carlo.  The default engine is the
# chain-batched vectorized NUTS: all chains advance in lockstep through
# ONE while loop, so every leapfrog step is a single batched (MXU-sized)
# gradient evaluation.

# %%
from brancher_tpu.inference import sample, NUTS

mcmc = sample(
    model,
    kernel=NUTS(),
    num_samples=300 if FAST else 1000,
    num_warmup=600 if FAST else 1000,  # the Stan-style warmup windows
    # need some room: very short warmups can leave chains stuck in the
    # stiff tails of the uniform(-2,2) init
    num_chains=8,
    key=jax.random.PRNGKey(3),
)
print(f"NUTS posterior: mu = {float(mcmc.samples['mu'].mean()):.3f} "
      f"± {float(mcmc.samples['mu'].std()):.3f}")
print(f"diagnostics: R-hat = {float(mcmc.diagnostics['r_hat']['mu']):.4f}, "
      f"min ESS = {float(np.min(mcmc.diagnostics['ess']['mu'])):.0f}, "
      f"divergences = {int(mcmc.diagnostics['num_divergences'])}")

# %% [markdown]
# ## 5. Checking against the closed form
#
# For this conjugate-ish model the marginal posterior of `mu` given the
# data and the true noise scale is Normal; both engines should agree with
# it (and with each other) within Monte-Carlo error.

# %%
prior_var, noise_var = 4.0, 0.16
post_prec = 1 / prior_var + len(data) / noise_var
post_mean = (data.sum() / noise_var) / post_prec
print(f"closed form (at true sigma): mu ≈ {post_mean:.3f} "
      f"± {np.sqrt(1/post_prec):.3f}")

# %% [markdown]
# ## Where to go next
#
# * `02_bayesian_logistic_regression` — minibatched data loaders and the
#   fused-potential fast path.
# * `03_vae` — amortized inference with flax networks inside the DSL.
# * `04_flow_vi` — normalizing-flow variational families.
# * `05_wvgd` — particle-based variational inference (Wasserstein and
#   Stein variants).
