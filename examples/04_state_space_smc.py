"""Linear-Gaussian state-space model: particle filter vs exact Kalman.

Run: python examples/04_state_space_smc.py
"""
import jax
import jax.numpy as jnp
import numpy as np

from brancher_tpu.inference.smc import smc_sample
from brancher_tpu.models.state_space import (
    LGSSMParams,
    kalman_filter,
    lgssm_state_space,
    make_lgssm_data,
)

params = LGSSMParams(a=0.9, q=0.3, c=1.0, r=0.5)
_, ys = make_lgssm_data(length=200, params=params)

res = smc_sample(lgssm_state_space(params), jnp.asarray(ys),
                 num_particles=8192, key=jax.random.PRNGKey(0))
ll_exact, means_exact, _ = kalman_filter(ys, params)

print(f"SMC    log marginal: {float(res.log_marginal):.3f}")
print(f"Kalman log marginal: {ll_exact:.3f}")
print("max |filter mean error|:",
      float(np.max(np.abs(np.asarray(res.filter_means) - means_exact))))
print("min ESS over time:", float(res.ess_history.min()))
