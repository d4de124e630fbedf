"""Bayesian logistic regression: minibatched SVI and vectorized NUTS.

Run: python examples/02_bayesian_logistic_regression.py
"""
import numpy as np

from brancher_tpu.inference import NUTS, perform_inference, sample
from brancher_tpu.models.logistic_regression import (
    logistic_regression_model,
    make_logreg_data,
)

x, y, w_true = make_logreg_data(num_points=1000, dim=16)

# full-batch NUTS posterior (1024 chains batched on-chip)
model = logistic_regression_model(x, y)
res = sample(model, kernel=NUTS(max_depth=8), num_samples=500, num_warmup=500,
             num_chains=64)
w_post = np.asarray(res.samples["w"].mean(axis=(0, 1)))
print("corr(posterior mean, true weights):",
      np.corrcoef(w_post, w_true)[0, 1].round(4))

# minibatch SVI with the reference's RandomIndices/EmpiricalVariable pattern
mini = logistic_regression_model(x, y, batch_size=128)
svi = perform_inference(mini, number_iterations=2000, number_samples=8, lr=0.02)
loc, _ = svi.guide.posterior_moments(svi.params["q"])
print("corr(SVI mean, NUTS mean):",
      np.corrcoef(np.asarray(loc), w_post)[0, 1].round(4))
