"""Measure the structure-preserving categorical fused potential
(ROADMAP r2 #9) vs vmapped autodiff on the real TPU: Bayesian softmax
classification NUTS + raw value_and_grad microbench.

RESULTS (axon TPU v5 lite, 2026-08-18, N=2000 d=32 K=10 -> D=330,
256 chains, max_depth=7):
  softmax NUTS fused=auto: sampler=8.13s minESS=111418 acc=0.794
  softmax NUTS fused=off : sampler=6.42s minESS=118611 acc=0.792
  autodiff : 0.648 ms/eval    fused-xla: 0.668 ms/eval
Conclusion: XLA autodiff of the DSL's own matmul(x, w) already emits
structure-preserving batched matmuls; the fused family's per-eval
scatter costs more than it saves.  Categorical is therefore NOT
auto-upgraded (CategoricalFusedFamily.auto_upgradable = False); the
family remains verified + opt-in for models whose graph obscures the
matmul structure.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

import brancher_tpu.functions as BF
from brancher_tpu import CategoricalVariable, NormalVariable, ProbabilisticModel
from brancher_tpu.inference import NUTS, sample

N, D, K = 2000, 32, 10
CHAINS, WARMUP, DRAWS = 256, 300, 500

rng = np.random.RandomState(0)
x = rng.normal(0, 1, size=(N, D)).astype(np.float32)
w_true = rng.normal(0, 1.0, size=(D, K)).astype(np.float32)
y = np.argmax(x @ w_true + rng.gumbel(size=(N, K)), -1).astype(np.int32)

w = NormalVariable(jnp.zeros((D, K)), jnp.ones((D, K)), "w")
b = NormalVariable(jnp.zeros(K), 2.0 * jnp.ones(K), "b")
yv = CategoricalVariable(logits=BF.matmul(x, w) + b, name="y")
yv.observe(y)
model = ProbabilisticModel([yv])

for mode in ("auto", "off"):
    kw = dict(kernel=NUTS(max_depth=7), num_samples=DRAWS, num_warmup=WARMUP,
              num_chains=CHAINS, key=jax.random.PRNGKey(0),
              chain_method="vectorized", fused_potential=mode)
    r = sample(model, **kw)   # compile
    r = sample(model, **kw)   # cached
    ess = np.asarray(r.diagnostics["ess"]["w"])
    print(f"softmax NUTS fused={mode}: sampler={r.diagnostics['sampler_seconds']:.2f}s "
          f"minESS={float(np.min(ess)):.0f} "
          f"acc={float(r.diagnostics['mean_accept_prob']):.3f}", flush=True)

# raw kernel microbench
from brancher_tpu.ops.pallas_glm import recognize_fused_family
comp = model.compiled()
fam = recognize_fused_family(comp, comp.initial_params)
print("family:", type(fam).__name__, "x_eff:", fam.x.shape)
import jax.flatten_util
z0, unravel = jax.flatten_util.ravel_pytree(comp.z_example())
def pot(zf):
    return comp.log_density_z(comp.initial_params, unravel(zf), None)
auto_vg = jax.jit(jax.vmap(jax.value_and_grad(pot)))
fused_j = jax.jit(fam.value_and_grad())

z = jax.random.normal(jax.random.PRNGKey(1), (CHAINS, z0.shape[0]))
for name, fn in (("autodiff", auto_vg), ("fused-xla", fused_j)):
    v, g = fn(z); jax.block_until_ready(g)
    t0 = time.time()
    for _ in range(50):
        v, g = fn(z)
    jax.block_until_ready(g)
    dt = (time.time() - t0) / 50
    flops = 4 * CHAINS * N * K * (fam.x.shape[1] if name == "fused-xla" else z0.shape[0])
    print(f"{name}: {dt*1e3:.3f} ms/eval ({flops/dt/1e12:.2f} TFLOP/s nominal)",
          flush=True)
