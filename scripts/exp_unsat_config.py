"""Find a logreg data config whose NUTS draws genuinely autocorrelate
(min-ESS < 0.9 * chains*draws) so the bench headline can report an
UNSATURATED measurement (VERDICT r2 #2).  Prototyped on CPU at small
chain counts; the ESS/draw ratio transfers to the TPU shape.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from brancher_tpu.models.logistic_regression import logistic_regression_model
from brancher_tpu.inference import sample, NUTS
from brancher_tpu.ops.pallas_logreg import logreg_value_and_grad_reference


def make_corr_data(num_points=1000, dim=32, rho=0.9, seed=0):
    rng = np.random.RandomState(seed)
    shared = rng.normal(0, 1, size=(num_points, 1)).astype(np.float32)
    indep = rng.normal(0, 1, size=(num_points, dim)).astype(np.float32)
    x = np.sqrt(rho) * shared + np.sqrt(1 - rho) * indep
    w_true = rng.normal(0, 1, size=dim).astype(np.float32) / np.sqrt(dim)
    logits = x @ w_true
    y = (rng.uniform(size=num_points) < 1.0 / (1.0 + np.exp(-logits))).astype(np.int32)
    return x.astype(np.float32), y


for rho in (0.0, 0.9, 0.97):
    x, y = make_corr_data(rho=rho)
    model = logistic_regression_model(x, y)
    xj, yj = jnp.asarray(x), jnp.asarray(np.asarray(y, np.float32))
    fused = lambda w: logreg_value_and_grad_reference(w, xj, yj, 1.0)
    res = sample(model, kernel=NUTS(max_depth=8), num_samples=500,
                 num_warmup=400, num_chains=32, key=jax.random.PRNGKey(0),
                 chain_method="vectorized", value_and_grad_fn=fused)
    ess = np.asarray(res.diagnostics["ess"]["w"])
    cap = 32 * 500
    print(f"rho={rho}: min_ess={ess.min():.0f} cap={cap} ratio={ess.min()/cap:.3f} "
          f"median_ess={np.median(ess):.0f} accept={float(res.diagnostics['mean_accept_prob']):.2f} "
          f"div={int(res.diagnostics['num_divergences'])}")
