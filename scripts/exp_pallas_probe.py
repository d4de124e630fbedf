"""Probe: is the Pallas fused kernel the compile-time sink on axon?"""
import os, tempfile, time, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", tempfile.mkdtemp())
import jax, jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from brancher_tpu.ops.pallas_logreg import (
    logreg_value_and_grad_pallas, logreg_value_and_grad_reference,
)

C, D, N = 1024, 32, 1000
x = jnp.ones((N, D)); y = jnp.ones((N,)); w = jnp.zeros((C, D))

t0 = time.time()
out = jax.block_until_ready(jax.jit(
    lambda w: logreg_value_and_grad_pallas(w, x, y, 1.0))(w))
print(f"pallas kernel alone: {time.time()-t0:.1f}s", flush=True)

def scan_pallas(w):
    def body(c, _):
        v, g = logreg_value_and_grad_pallas(c, x, y, 1.0)
        return c + 0.01 * g, v.mean()
    return jax.lax.scan(body, w, None, length=500)
t0 = time.time()
out = jax.block_until_ready(jax.jit(scan_pallas)(w))
print(f"scan500 of pallas: {time.time()-t0:.1f}s", flush=True)

def while_pallas(w):
    def cond(s): return s[1] < 32
    def step(s):
        c, i = s
        v, g = logreg_value_and_grad_pallas(c, x, y, 1.0)
        return (c + 0.01 * g, i + 1)
    return jax.lax.while_loop(cond, step, (w, 0))
t0 = time.time()
out = jax.block_until_ready(jax.jit(while_pallas)(w))
print(f"while32 of pallas: {time.time()-t0:.1f}s", flush=True)

def scan_while_pallas(w):
    def body(c, k):
        n = jax.random.randint(k, (), 1, 33)
        def leap(i, cc):
            v, g = logreg_value_and_grad_pallas(cc, x, y, 1.0)
            return cc + 0.01 * g
        c = jax.lax.fori_loop(0, n, leap, c)
        return c, c.mean()
    return jax.lax.scan(body, w, jax.random.split(jax.random.PRNGKey(0), 500))
t0 = time.time()
out = jax.block_until_ready(jax.jit(scan_while_pallas)(w))
print(f"scan500 x while-fori of pallas: {time.time()-t0:.1f}s", flush=True)
