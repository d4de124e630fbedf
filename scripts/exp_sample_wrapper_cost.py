"""Find where sample() loses 10x vs calling nuts_batched directly."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from brancher_tpu.models.logistic_regression import logistic_regression_model, make_logreg_data
from brancher_tpu.ops.pallas_logreg import logreg_value_and_grad_pallas
from brancher_tpu.inference.vectorized_nuts import nuts_batched
from brancher_tpu.inference import sample, NUTS

C, D, N, W, S = 1024, 32, 1000, 500, 1000
x, y, _ = make_logreg_data(num_points=N, dim=D, seed=0)
xj, yj = jnp.asarray(x), jnp.asarray(np.asarray(y, np.float32))
vg = lambda w: logreg_value_and_grad_pallas(w, xj, yj, 1.0)
model = logistic_regression_model(x, y)
z0 = jax.random.uniform(jax.random.PRNGKey(1), (C, D), minval=-2, maxval=2)

# 1) direct engine, bench-like target accept 0.8 (default), init 0.12
f = jax.jit(lambda k: nuts_batched(vg, z0, W, S, k, max_depth=8,
                                   init_step_size=0.12, target_accept=0.8))
r = jax.block_until_ready(f(jax.random.PRNGKey(0)).samples)
t0 = time.time(); r = f(jax.random.PRNGKey(0)); jax.block_until_ready(r.samples)
dt = time.time() - t0
iters = int(np.sum(np.asarray(r.num_leapfrog))) + int(np.asarray(r.warmup_leapfrog))
print(f"direct ta=0.8: {dt:.2f}s iters={iters} ({dt/iters*1e6:.0f} us/iter) "
      f"eps={float(r.step_size):.3f}", flush=True)

# 2) through sample() exactly like the bench child
kw = dict(kernel=NUTS(max_depth=8), num_samples=S, num_warmup=W,
          num_chains=C, key=jax.random.PRNGKey(0),
          chain_method="vectorized", value_and_grad_fn=vg)
r2 = sample(model, **kw); r2 = sample(model, **kw)
iters2 = int(r2.diagnostics["total_leapfrog_steps"]) // C + int(
    np.asarray(r2.diagnostics.get("warmup_leapfrog", 0)))
print(f"sample(): sampler={r2.diagnostics['sampler_seconds']:.2f}s "
      f"iters~{iters2} ({float(r2.diagnostics['sampler_seconds'])/max(iters2,1)*1e6:.0f} us/iter) "
      f"eps={float(r2.diagnostics['step_size']):.4f}", flush=True)

# 3) sample() with the probe disabled (adapt_step_size off after manual init)
kw3 = dict(kw); kw3["adapt_step_size"] = False; kw3["init_step_size"] = float(r2.diagnostics["step_size"])
r3 = sample(model, **kw3); r3 = sample(model, **kw3)
iters3 = int(r3.diagnostics["total_leapfrog_steps"]) // C + int(
    np.asarray(r3.diagnostics.get("warmup_leapfrog", 0)))
print(f"sample(no-probe, fixed eps): sampler={r3.diagnostics['sampler_seconds']:.2f}s "
      f"iters~{iters3} ({float(r3.diagnostics['sampler_seconds'])/max(iters3,1)*1e6:.0f} us/iter)", flush=True)
