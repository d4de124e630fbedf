"""MXU-bound roofline measurement (VERDICT r2 missing #3 / ROADMAP #2).

The N-tiled GLM kernels (ops/pallas_glm.py) were built for d >= 1024,
N >= 1e5 — shapes where the fused potential's matmuls are large enough
to be MXU-bound rather than latency/VPU-bound (the bench headline's
d=32 runs at ~2% of peak by design).  This script measures achieved
TFLOP/s of the bernoulli value+grad potential at those shapes:

  * fused XLA reference, f32
  * fused XLA reference, bf16 design matrix (f32 accumulate)
  * Pallas N-tiled kernel, f32

FLOPs counted: 4*C*N*d per call (two [C,d]x[d,N]-class matmuls in
value+grad).  v5e peaks: ~197 TFLOP/s bf16, ~49 TFLOP/s f32 (MXU does
f32 via multiple bf16 passes).  HBM roof: the design matrix streams once
per call -> arithmetic intensity ~= C FLOPs/byte, so C >= ~256 is
compute-bound at bf16.

Run on the real TPU: python scripts/exp_mxu_roofline.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from brancher_tpu.ops.pallas_glm import (
    bernoulli_vg_pallas,
    bernoulli_vg_reference,
)

V5E_BF16_PEAK = 197e12
V5E_F32_PEAK = 49e12
V5E_HBM_GBS = 819e9


def timed(f, z, *args, reps=10):
    """Serialized timing: each iteration's z depends on the previous
    grad, and the loop closes with a host fetch of a dependent scalar.
    On the axon remote path a bare block_until_ready returned ~launch
    latency (0.06 ms for a 550-GFLOP program, 46x the f32 roofline —
    impossible), so independent same-input calls cannot be trusted;
    the dependency chain forces real back-to-back execution."""
    val, grad = f(z, *args)
    jax.block_until_ready((val, grad))
    t0 = time.perf_counter()
    zz = z
    for _ in range(reps):
        val, grad = f(zz, *args)
        zz = zz + 1e-30 * grad
    float(val[0])  # host fetch: everything above must have executed
    return (time.perf_counter() - t0) / reps


def run_shape(c, n, d, reps=10):
    print(f"\n== C={c} N={n} d={d} ==", flush=True)
    rng = np.random.RandomState(0)
    # keep host memory sane: generate in float32 directly
    x = rng.standard_normal((n, d)).astype(np.float32) / np.sqrt(d)
    y = (rng.uniform(size=n) < 0.5).astype(np.float32)
    z = rng.standard_normal((c, d)).astype(np.float32)
    b = np.zeros((n,), np.float32)
    pm = np.zeros((d,), np.float32)
    piv = np.ones((d,), np.float32)

    xj = jnp.asarray(x)
    yj, zj, bj = jnp.asarray(y), jnp.asarray(z), jnp.asarray(b)
    pmj, pivj = jnp.asarray(pm), jnp.asarray(piv)
    flops = 4.0 * c * n * d
    bytes_min = 4.0 * n * d + 3 * 4.0 * c * d  # X stream + z/grad traffic
    print(f"   arithmetic intensity ~ {flops/bytes_min:.0f} FLOP/byte; "
          f"HBM floor {bytes_min/V5E_HBM_GBS*1e3:.1f} ms", flush=True)

    # NOTE: all operands are ARGUMENTS, not closure captures — a
    # closed-over [N,d] design matrix becomes an HLO constant, and at
    # N=131072 x d=1024 the 512 MB literal overflows the remote compile
    # service's request limit (HTTP 413, measured 2026-08-20).
    ref32 = jax.jit(bernoulli_vg_reference)
    t = timed(ref32, zj, xj, yj, bj, pmj, pivj, reps=reps)
    print(f"   XLA f32      : {t*1e3:8.2f} ms  {flops/t/1e12:7.2f} TFLOP/s "
          f"({100*flops/t/V5E_F32_PEAK:5.1f}% of f32 peak)", flush=True)

    x16 = xj.astype(jnp.bfloat16)

    def ref_bf16(zz, x16, yj, bj, pmj, pivj):
        # bf16 multiplies, f32 accumulate/elementwise — the MXU-native mode
        z16 = zz.astype(jnp.bfloat16)
        logits = jnp.dot(z16, x16.T, preferred_element_type=jnp.float32) + bj[None, :]
        ll = jnp.sum(yj[None, :] * logits - jax.nn.softplus(logits), axis=-1)
        dz = zz - pmj[None, :]
        val = ll - 0.5 * jnp.sum(dz * dz * pivj[None, :], -1)
        resid = (yj[None, :] - jax.nn.sigmoid(logits)).astype(jnp.bfloat16)
        grad = jnp.dot(resid, x16, preferred_element_type=jnp.float32) - dz * pivj[None, :]
        return val, grad

    refb = jax.jit(ref_bf16)
    t = timed(refb, zj, x16, yj, bj, pmj, pivj, reps=reps)
    print(f"   XLA bf16     : {t*1e3:8.2f} ms  {flops/t/1e12:7.2f} TFLOP/s "
          f"({100*flops/t/V5E_BF16_PEAK:5.1f}% of bf16 peak)", flush=True)

    # numeric sanity: bf16 path close to f32 on values
    v32, g32 = ref32(zj, xj, yj, bj, pmj, pivj)
    vb, gb = refb(zj, x16, yj, bj, pmj, pivj)
    rel = float(jnp.max(jnp.abs(vb - v32) / (jnp.abs(v32) + 1.0)))
    print(f"   bf16 rel err : {rel:.2e}", flush=True)

    from functools import partial
    # smaller blocks at d=1024: 256x1024 blocks overflow the 16 MB
    # scoped-vmem stack (measured: 18.24M request -> compile error)
    pall = jax.jit(partial(
        bernoulli_vg_pallas, block_chains=128, block_rows=512))
    try:
        t = timed(pall, zj, xj, yj, bj, pmj, pivj, reps=reps)
        vp, gp = pall(zj, xj, yj, bj, pmj, pivj)
        err = float(jnp.max(jnp.abs(vp - v32) / (jnp.abs(v32) + 1.0)))
        print(f"   Pallas f32   : {t*1e3:8.2f} ms  {flops/t/1e12:7.2f} TFLOP/s "
              f"({100*flops/t/V5E_F32_PEAK:5.1f}% of f32 peak)  rel err {err:.1e}",
              flush=True)
    except Exception as e:
        print(f"   Pallas f32   : FAILED ({type(e).__name__}: {e})", flush=True)


if __name__ == "__main__":
    print("backend:", jax.devices()[0], flush=True)
    if len(sys.argv) > 1:
        # crossover sweep: C,N,d triples as "C:N:d" args
        for spec in sys.argv[1:]:
            c, n, d = (int(v) for v in spec.split(":"))
            run_shape(c, n, d)
    else:
        run_shape(1024, 131072, 1024)
        run_shape(256, 1048576, 1024, reps=5)
        run_shape(1024, 1048576, 1024, reps=5)
