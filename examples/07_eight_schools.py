"""Eight schools (hierarchical Gaussian, non-centered parameterization).

The classic partial-pooling benchmark: school effects theta_i share a
population mean/scale.  The non-centered form theta = mu + tau * theta_raw
is the geometry NUTS needs — expressed directly with DSL arithmetic.

Run: python examples/07_eight_schools.py
"""
import numpy as np

from brancher_tpu import (DeterministicVariable, HalfCauchyVariable,
                          NormalVariable, ProbabilisticModel)
from brancher_tpu.inference import NUTS, sample

y_obs = np.asarray([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0], np.float32)
sigma = np.asarray([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0], np.float32)

mu = NormalVariable(0.0, 5.0, "mu")
tau = HalfCauchyVariable(5.0, "tau")
theta_raw = NormalVariable(np.zeros(8, np.float32), np.ones(8, np.float32), "theta_raw")
theta = DeterministicVariable(mu + tau * theta_raw, "theta")  # non-centered
y = NormalVariable(theta, sigma, "y")
y.observe(y_obs)
model = ProbabilisticModel([y])

res = sample(model, kernel=NUTS(max_depth=8), num_samples=1000, num_warmup=1000,
             num_chains=16)
mu_s = res.samples["mu"]
tau_s = res.samples["tau"]
print(f"mu:  {float(mu_s.mean()):.2f} ± {float(mu_s.std()):.2f}   (Stan ref ≈ 4.4 ± 3.3)")
print(f"tau: {float(tau_s.mean()):.2f} ± {float(tau_s.std()):.2f}  (Stan ref ≈ 3.6 ± 3.2)")
print(f"divergences: {int(res.diagnostics['num_divergences'])}, "
      f"r_hat(mu) = {float(res.diagnostics['r_hat']['mu']):.4f}")
print("per-school effects:", np.asarray(res.samples["theta"].mean(axis=(0, 1))).round(1))
