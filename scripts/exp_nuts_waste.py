"""Quantify vectorized-NUTS lockstep waste (ROADMAP r2 #10 'chain
compaction'): per draw the while loop runs max-over-chains tree
iterations while each chain only LIVES for its own tree size.  The
ratio num_leapfrog / chain_leapfrog bounds what a compacted
(per-chain early-exit / draw-pipelined) engine could recover.

RESULTS: see bottom after first run.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

from brancher_tpu.inference import NUTS, sample
from brancher_tpu.models.logistic_regression import (
    logistic_regression_model, make_logreg_data,
)
from brancher_tpu.ops.pallas_logreg import logreg_value_and_grad_reference

N, D = 1000, 32
CHAINS, WARMUP, DRAWS = 1024, 500, 1000

x, y, _ = make_logreg_data(num_points=N, dim=D, seed=0)
model = logistic_regression_model(x, y)
xj, yj = jnp.asarray(x), jnp.asarray(np.asarray(y, np.float32))
fused = lambda w: logreg_value_and_grad_reference(w, xj, yj, 1.0)

kw = dict(kernel=NUTS(max_depth=8), num_samples=DRAWS, num_warmup=WARMUP,
          num_chains=CHAINS, key=jax.random.PRNGKey(0),
          chain_method="vectorized", value_and_grad_fn=fused)
r = sample(model, **kw)
r = sample(model, **kw)
num_lf = np.asarray(r.stats["num_steps"])[0]  # [S] shared loop iterations
chain_lf = np.asarray(r.diagnostics["chain_leapfrog"])  # [S] mean live
print(f"bench shape (d={D}, {CHAINS} chains): sampler="
      f"{r.diagnostics['sampler_seconds']:.2f}s")
print(f"  loop iterations/draw:   mean {num_lf.mean():.1f}  "
      f"p50 {np.median(num_lf):.0f}  p95 {np.percentile(num_lf,95):.0f}")
print(f"  live leapfrogs/draw:    mean {chain_lf.mean():.1f}")
print(f"  lockstep waste factor:  {num_lf.mean()/chain_lf.mean():.2f}x")

# harder geometry: eight-schools-like funnel raises tree-size variance
from brancher_tpu import HalfCauchyVariable, NormalVariable, ProbabilisticModel
mu = NormalVariable(0., 5., "mu")
tau = HalfCauchyVariable(5., "tau")
theta = NormalVariable(mu, tau, "theta", plate_shape=(8,))
y8 = np.asarray([28., 8., -3., 7., -1., 1., 18., 12.], np.float32)
obs = NormalVariable(theta, np.asarray([15.,10.,16.,11.,9.,11.,10.,18.],
                                       np.float32), "y")
obs.observe(y8)
m8 = ProbabilisticModel([obs])
kw8 = dict(kernel=NUTS(max_depth=10), num_samples=1000, num_warmup=500,
           num_chains=256, key=jax.random.PRNGKey(1),
           chain_method="vectorized")
r8 = sample(m8, **kw8)
r8 = sample(m8, **kw8)
num_lf = np.asarray(r8.stats["num_steps"])[0]
chain_lf = np.asarray(r8.diagnostics["chain_leapfrog"])
print(f"eight schools (funnel, 256 chains): sampler="
      f"{r8.diagnostics['sampler_seconds']:.2f}s")
print(f"  loop iterations/draw:   mean {num_lf.mean():.1f}  "
      f"p50 {np.median(num_lf):.0f}  p95 {np.percentile(num_lf,95):.0f}")
print(f"  live leapfrogs/draw:    mean {chain_lf.mean():.1f}")
print(f"  lockstep waste factor:  {num_lf.mean()/chain_lf.mean():.2f}x")

# --- pipelined engine timing (same shapes) ------------------------------
print()
for name, m_, kw_ in (("bench-logreg", model, kw), ("eight-schools", m8, kw8)):
    kp = dict(kw_)
    kp["kernel"] = NUTS(max_depth=kp["kernel"].max_depth, pipelined=True)
    rp = sample(m_, **kp)
    rp = sample(m_, **kp)
    it = int(np.sum(np.asarray(rp.stats["num_steps"])[0]))
    ess_name = "w" if name == "bench-logreg" else "mu"
    ess = float(np.min(np.asarray(rp.diagnostics["ess"][ess_name])))
    print(f"{name} PIPELINED: sampler={rp.diagnostics['sampler_seconds']:.2f}s "
          f"total_iters={it} minESS({ess_name})={ess:.0f} "
          f"acc={float(rp.diagnostics['mean_accept_prob']):.3f}")
