"""Normal-Normal conjugate mean inference: SVI + NUTS vs closed form.

Executable documentation (reference parity: Brancher ships examples as
its documentation, SURVEY.md §2 "Examples").  Run: python examples/01_conjugate_gaussian.py
"""
import numpy as np

from brancher_tpu import NormalVariable, ProbabilisticModel
from brancher_tpu.inference import NUTS, perform_inference, sample

# ground truth data
data = np.random.RandomState(0).normal(1.5, 1.0, size=50).astype(np.float32)

# model: mu ~ N(0, 2);  x_i ~ N(mu, 1)
mu = NormalVariable(0.0, 2.0, "mu")
x = NormalVariable(mu, 1.0, "x")
x.observe(data)
model = ProbabilisticModel([x])

# closed-form posterior
post_var = 1.0 / (1 / 4.0 + len(data))
post_mean = post_var * data.sum()
print(f"analytic: mean={post_mean:.4f} var={post_var:.5f}")

# mean-field SVI
res = perform_inference(model, number_iterations=2000, number_samples=32, lr=0.02)
loc, var = res.guide.posterior_moments(res.params["q"])
print(f"SVI:      mean={float(loc[0]):.4f} var={float(var[0]):.5f}")

# NUTS
mcmc = sample(model, kernel=NUTS(), num_samples=1000, num_warmup=500, num_chains=8)
print(f"NUTS:     mean={float(mcmc.samples['mu'].mean()):.4f} "
      f"var={float(mcmc.samples['mu'].var()):.5f}  "
      f"r_hat={float(mcmc.diagnostics['r_hat']['mu']):.4f}")
