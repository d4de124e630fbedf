"""Why the draw-pipelined NUTS engine loses on THIS backend: any
scattered write into a while-loop carry buffer copies the whole buffer
per iteration (no in-place aliasing), while dynamic_update_slice
aliases fine.

Measured (axon TPU v5 lite, 2026-08-18, buf [1000,1024,32] = 131 MB):
  scatter .at[row_vec, cidx].set:      0.946 ms/iter  (= one full-buffer
                                        pass at ~140 GB/s per iteration)
  scatter + unique_indices hint:       0.947 ms/iter  (hint ignored)
  vmapped per-chain dynamic_update_slice [C,S,d]: 3.2 ms/iter (worse)
  dynamic_update_slice (scalar row):   0.027 ms/iter  (aliases in place)

Consequence: NUTS(pipelined=True) executes 2.5x FEWER loop iterations
on the eight-schools funnel (29k vs 74k) yet runs 2.4x slower end to
end (3.9 s vs 1.6 s) because each iteration pays a buffer copy.  The
engine stays opt-in; on backends where scatter aliases into while
carries it should win the full lockstep-waste factor (3.16x measured,
scripts/exp_nuts_waste.py).  A scatter-free lookahead-B design (small
unrolled where-select ring instead of scatter) is the ROADMAP follow-up.
"""
import sys; sys.path.insert(0,'/root/repo')
import time, jax, jax.numpy as jnp
import numpy as np
S, C, D = 1000, 1024, 32
cidx = jnp.arange(C)

def run_scatter(n_iters):
    def body(carry):
        i, buf, x = carry
        row = (cidx + i) % S
        buf = buf.at[row, cidx].set(x)
        return (i+1, buf, x + 1.0)
    def cond(c): return c[0] < n_iters
    i, buf, x = jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), jnp.zeros((S, C, D)), jnp.ones((C, D))))
    return buf.sum()

def run_dus(n_iters):
    # dynamic_update_slice: same bytes, contiguous row (all chains same row)
    def body(carry):
        i, buf, x = carry
        buf = jax.lax.dynamic_update_slice(buf, x[None], (i % S, 0, 0))
        return (i+1, buf, x + 1.0)
    def cond(c): return c[0] < n_iters
    i, buf, x = jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), jnp.zeros((S, C, D)), jnp.ones((C, D))))
    return buf.sum()

for name, fn in (("scatter", run_scatter), ("dyn_update_slice", run_dus)):
    f = jax.jit(fn, static_argnums=0)
    r = f(1000); jax.block_until_ready(r)
    t0=time.time(); r = f(1000); jax.block_until_ready(r)
    dt = time.time()-t0
    print(f"{name}: {dt:.3f}s for 1000 iters -> {dt:.6f} s/iter", flush=True)
