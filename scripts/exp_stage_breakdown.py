"""Break the chees-bench cold time into stages."""
import os, tempfile, time, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", tempfile.mkdtemp())
import jax, jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
T0 = time.time()
def mark(name):
    print(f"{name}: +{time.time()-T0:.1f}s", flush=True)

from brancher_tpu.models.logistic_regression import (
    logistic_regression_model, make_logreg_data,
)
from brancher_tpu.inference import sample, ChEESHMC
from brancher_tpu.ops.pallas_logreg import logreg_value_and_grad_pallas
from brancher_tpu.inference.chees import chees_hmc
mark("imports")

n_points, dim, chains = 1000, 32, 1024
x, y, _ = make_logreg_data(num_points=n_points, dim=dim, seed=0)
xj, yj = jnp.asarray(x), jnp.asarray(np.asarray(y, np.float32))
fused = lambda w: logreg_value_and_grad_pallas(w, xj, yj, 1.0)

out = jax.block_until_ready(jax.jit(fused)(jnp.zeros((chains, dim))))
mark("pallas kernel compile")

z0 = jax.random.uniform(jax.random.PRNGKey(1), (chains, dim), minval=-2, maxval=2)
res = jax.jit(lambda k: chees_hmc(fused, z0, 500, 1000, k))(jax.random.PRNGKey(0))
jax.block_until_ready(res.samples)
mark("chees_hmc program")

from brancher_tpu.inference.diagnostics import effective_sample_size
ess = effective_sample_size(res.samples)
jax.block_until_ready(ess)
mark("ess")

model = logistic_regression_model(x, y)
res2 = sample(model, kernel=ChEESHMC(), num_samples=1000, num_warmup=500,
              num_chains=chains, key=jax.random.PRNGKey(0),
              chain_method="vectorized", value_and_grad_fn=fused)
jax.block_until_ready(res2.samples["w"])
mark("full sample() (incremental)")
