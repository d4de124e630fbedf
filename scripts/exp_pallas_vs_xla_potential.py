"""Is the Pallas potential actually faster than the fused XLA reference
inside the sampling loops, given per-launch overhead on axon?"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from brancher_tpu.models.logistic_regression import logistic_regression_model, make_logreg_data
from brancher_tpu.inference import NUTS, HMC, ChEESHMC, sample
from brancher_tpu.ops.pallas_logreg import (
    logreg_value_and_grad_pallas, logreg_value_and_grad_reference,
)

x, y, _ = make_logreg_data(num_points=1000, dim=32, seed=0)
model = logistic_regression_model(x, y)
xj, yj = jnp.asarray(x), jnp.asarray(np.asarray(y, np.float32))
variants = {
    "pallas": lambda w: logreg_value_and_grad_pallas(w, xj, yj, 1.0),
    "xla": lambda w: logreg_value_and_grad_reference(w, xj, yj, 1.0),
}
for kern, label, kwargs in (
    (NUTS(max_depth=8), "nuts", {}),
    (HMC(num_integration_steps=32), "hmc", {}),
    (ChEESHMC(), "chees", {}),
):
    for vname, fused in variants.items():
        kw = dict(kernel=kern, num_samples=1000, num_warmup=500,
                  num_chains=1024, key=jax.random.PRNGKey(0),
                  chain_method="vectorized", value_and_grad_fn=fused)
        r = sample(model, **kw); r = sample(model, **kw)
        ess = np.asarray(r.diagnostics["ess"]["w"])
        print(f"{label}/{vname}: sampler={r.diagnostics['sampler_seconds']:.3f}s "
              f"minESS={float(np.min(ess)):.0f}", flush=True)
