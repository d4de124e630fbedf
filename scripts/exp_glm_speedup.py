"""Measure fused-GLM-potential speedup vs vmapped autodiff on real TPU:
AR(1) NUTS (the VERDICT r1 #3 'done' criterion) + raw kernel microbench."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

from brancher_tpu.inference import NUTS, sample
from brancher_tpu.models.autoregressive import ar_model, make_ar_data

data = make_ar_data(length=2000, coeffs=(0.7,), noise=0.3, seed=0)
model = ar_model(data, order=1)
chains, warmup, draws = 512, 400, 800

for mode in ("auto", "off"):
    kw = dict(kernel=NUTS(max_depth=8), num_samples=draws, num_warmup=warmup,
              num_chains=chains, key=jax.random.PRNGKey(0),
              chain_method="vectorized", fused_potential=mode)
    r = sample(model, **kw)   # compile
    r = sample(model, **kw)   # cached
    ess = np.asarray(r.diagnostics["ess"]["coeffs"])
    print(f"AR1 NUTS fused={mode}: sampler={r.diagnostics['sampler_seconds']:.2f}s "
          f"minESS={float(np.min(ess)):.0f} acc={float(r.diagnostics['mean_accept_prob']):.3f} "
          f"coeff={float(np.mean(np.asarray(r.samples['coeffs']))):.3f}",
          flush=True)

# raw kernel microbench: fused pallas vs vmapped autodiff value_and_grad
from brancher_tpu.ops.pallas_glm import recognize_fused_potential
comp = model.compiled()
fused = recognize_fused_potential(comp, comp.initial_params)
import jax.flatten_util
z0, unravel = jax.flatten_util.ravel_pytree(comp.z_example())
def pot(zf):
    return comp.log_density_z(comp.initial_params, unravel(zf), None)
auto_vg = jax.jit(jax.vmap(jax.value_and_grad(pot)))
fused_j = jax.jit(fused)

z = jax.random.normal(jax.random.PRNGKey(1), (chains, z0.shape[0]))
for name, fn in (("autodiff", auto_vg), ("fused-pallas", fused_j)):
    jax.block_until_ready(fn(z))
    t0 = time.time()
    for _ in range(200):
        out = fn(z)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 200
    print(f"kernel {name}: {dt*1e6:.1f} us per [C={chains},d] value+grad", flush=True)
