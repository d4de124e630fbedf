"""Where does the per-iteration cost blow up between small and bench-scale
NUTS configs?"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from brancher_tpu.models.logistic_regression import make_logreg_data
from brancher_tpu.ops.pallas_logreg import logreg_value_and_grad_pallas
from brancher_tpu.inference.vectorized_nuts import nuts_batched

C, D, N = 1024, 32, 1000
x, y, _ = make_logreg_data(num_points=N, dim=D, seed=0)
xj, yj = jnp.asarray(x), jnp.asarray(np.asarray(y, np.float32))
vg = lambda w: logreg_value_and_grad_pallas(w, xj, yj, 1.0)
z0 = jax.random.uniform(jax.random.PRNGKey(1), (C, D), minval=-2, maxval=2)

for warm, draws in ((100, 200), (500, 200), (100, 1000), (500, 1000)):
    f = jax.jit(lambda k: nuts_batched(vg, z0, warm, draws, k, max_depth=8,
                                       init_step_size=0.12))
    r = jax.block_until_ready(f(jax.random.PRNGKey(0)).samples)
    t0 = time.time()
    r = f(jax.random.PRNGKey(0))
    jax.block_until_ready(r.samples)
    dt = time.time() - t0
    draw_iters = int(np.sum(np.asarray(r.num_leapfrog)))
    warm_iters = int(np.asarray(r.warmup_leapfrog))
    tot = draw_iters + warm_iters
    print(f"w={warm} d={draws}: {dt:.2f}s iters={tot} "
          f"({dt/tot*1e6:.0f} us/iter) eps={float(r.step_size):.3f}", flush=True)
