"""Real-TPU microbenchmark: fused Pallas leapfrog vs XLA loop-of-potential,
plus HMC/ChEES end-to-end with and without it (bench logreg config)."""
import os, sys, time
T0 = __import__("time").time()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

from brancher_tpu.models.logistic_regression import (
    logistic_regression_model, make_logreg_data,
)
from brancher_tpu.ops.pallas_glm import recognize_fused_family
from brancher_tpu.ops.pallas_leapfrog import reference_leapfrog

n_points, dim, chains = 1000, 32, 1024
x, y, _ = make_logreg_data(num_points=n_points, dim=dim, seed=0)
model = logistic_regression_model(x, y)
comp = model.compiled()
print(f"imports done +{time.time()-T0:.0f}s", flush=True)
fam = recognize_fused_family(comp, comp.initial_params)
assert fam is not None, "recognizer failed"
print(f"recognized +{time.time()-T0:.0f}s", flush=True)

vg = fam.value_and_grad()
lf_pl = fam.leapfrog()
lf_ref = reference_leapfrog(vg)

z = jax.random.normal(jax.random.PRNGKey(0), (chains, dim)) * 0.1
r = jax.random.normal(jax.random.PRNGKey(1), (chains, dim))
_, g = jax.jit(vg)(z)
inv_mass = jnp.ones((dim,))

L = 32
REP = 50
for name, lf in (("xla-loop", lf_ref), ("pallas-fused", lf_pl)):
    f = jax.jit(lambda z, r, g: lf(z, r, g, 0.05, inv_mass, L))

    def chained(z, r, g):
        def body(carry, _):
            z, r, g = carry
            z, r, v, g = f(z, r, g)
            return (z, r, g), v[0]
        (z, r, g), vs = jax.lax.scan(body, (z, r, g), None, length=REP)
        return z, vs

    cj = jax.jit(chained)
    print(f"{name} compile start +{time.time()-T0:.0f}s", flush=True)
    out = jax.block_until_ready(cj(z, r, g))
    print(f"{name} compiled +{time.time()-T0:.0f}s", flush=True)
    t0 = time.time()
    out = jax.block_until_ready(cj(z, r, g))
    dt = time.time() - t0
    per_step = dt / (REP * L)
    print(f"{name}: {dt*1e3:.1f} ms for {REP} trajs x {L} steps "
          f"-> {per_step*1e6:.2f} us/leapfrog ({chains} chains)", flush=True)

# end-to-end ChEES and HMC through sample()
from brancher_tpu.inference import ChEESHMC, HMC, sample

for kern, label in ((ChEESHMC(), "chees"), (HMC(num_integration_steps=32), "hmc")):
    for mode in ("auto", "off"):
        kw = dict(kernel=kern, num_samples=1000, num_warmup=500,
                  num_chains=chains, key=jax.random.PRNGKey(0),
                  chain_method="vectorized", fused_potential=mode)
        if mode == "off":
            # still use the fused potential, but no fused leapfrog
            from brancher_tpu.ops.pallas_logreg import logreg_value_and_grad_pallas
            xj, yj = jnp.asarray(x), jnp.asarray(np.asarray(y, np.float32))
            kw["value_and_grad_fn"] = lambda w: logreg_value_and_grad_pallas(w, xj, yj, 1.0)
        r1 = sample(model, **kw)
        r1 = sample(model, **kw)
        ess = np.asarray(r1.diagnostics["ess"]["w"])
        print(f"{label} fused_leapfrog={'yes' if mode=='auto' else 'no'}: "
              f"sampler={r1.diagnostics['sampler_seconds']:.3f}s "
              f"minESS={float(np.min(ess)):.0f} "
              f"acc={float(r1.diagnostics['mean_accept_prob']):.3f}", flush=True)
