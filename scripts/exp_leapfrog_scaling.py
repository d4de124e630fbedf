"""Fused leapfrog vs XLA loop across chain counts (latency vs compute)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

from brancher_tpu.models.logistic_regression import (
    logistic_regression_model, make_logreg_data,
)
from brancher_tpu.ops.pallas_glm import recognize_fused_family
from brancher_tpu.ops.pallas_leapfrog import build_fused_leapfrog, reference_leapfrog

x, y, _ = make_logreg_data(num_points=1000, dim=32, seed=0)
comp = logistic_regression_model(x, y).compiled()
fam = recognize_fused_family(comp, comp.initial_params)
vg = fam.value_and_grad()
lf_ref = reference_leapfrog(vg)

L, REP = 32, 50
for chains in (32, 128, 512, 1024, 4096):
    lf_pl = build_fused_leapfrog(
        fam.family, fam.x, fam.y, fam.b, fam.prior_mean, fam.prior_inv_var,
        u=fam.u, c0=fam.c0, ll_scale=fam.ll_scale, block_chains=1024)
    z = jax.random.normal(jax.random.PRNGKey(0), (chains, 32)) * 0.1
    r = jax.random.normal(jax.random.PRNGKey(1), (chains, 32))
    _, g = jax.jit(vg)(z)
    inv_mass = jnp.ones((32,))
    row = [f"C={chains}:"]
    for name, lf in (("xla", lf_ref), ("pallas", lf_pl)):
        f = jax.jit(lambda z, r, g: lf(z, r, g, 0.05, inv_mass, L))
        def chained(z, r, g):
            def body(carry, _):
                z, r, g = carry
                z, r, v, g = f(z, r, g)
                return (z, r, g), v[0]
            return jax.lax.scan(body, (z, r, g), None, length=REP)[1]
        cj = jax.jit(chained)
        jax.block_until_ready(cj(z, r, g))
        t0 = time.time()
        out = jax.block_until_ready(cj(z, r, g))
        dt = time.time() - t0
        row.append(f"{name}={dt/(REP*L)*1e6:.2f}us/leap")
    print(" ".join(row), flush=True)
