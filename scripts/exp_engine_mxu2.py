"""Engine-level MXU roofline, part 2 (VERDICT r3 missing #1).

exp_engine_mxu.py measured ChEES at d=1024/N=131072 at ~19 TFLOP/s in
ALL THREE potential modes — mode-independent, so the time is NOT in the
potential matmuls.  This script localizes the overhead and demonstrates
the roofline INSIDE sample():

  A. bare potential value+grad at the engine shape (scan of 32 chained
     evals, dispatched EAGERLY — an outer jax.jit ships the 537 MB
     design matrix in the compile-request payload and the remote
     service rejects it with HTTP 413) — the in-engine cost of one
     eval, for the breakdown;
  B. HMC through sample() (static L=16, jitter off: a scanned
     fixed-length integrator, the TPU-first MXU-bound engine;
     jit_runner=False for the same payload-limit reason) per mode,
     reporting sampling-phase TFLOP/s = leapfrogs * 4*C*N*d / sampler_s.

Run: python scripts/exp_engine_mxu2.py [C]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

C, N, D = 256, 131072, 1024
L, WARMUP, DRAWS = 16, 64, 64
if len(sys.argv) > 1:
    C = int(sys.argv[1])
if len(sys.argv) > 2:
    N = int(sys.argv[2])
if len(sys.argv) > 3:
    WARMUP = DRAWS = int(sys.argv[3])
SKIP_BARE = os.environ.get("SKIP_BARE", "0") == "1"


def main():
    from brancher_tpu.ops.pallas_glm import FusedFamily
    from brancher_tpu.models.logistic_regression import logistic_regression_model
    from brancher_tpu.inference import sample, HMC

    print("backend:", jax.devices()[0], flush=True)
    rng = np.random.RandomState(0)
    x = (rng.standard_normal((N, D)) / np.sqrt(D)).astype(np.float32)
    w_true = rng.standard_normal(D).astype(np.float32) * 0.3
    y = (rng.uniform(size=N) < 1.0 / (1.0 + np.exp(-x @ w_true))).astype(
        np.float32
    )
    fam = FusedFamily(
        family="bernoulli_logit", x=jnp.asarray(x), y=jnp.asarray(y),
        b=jnp.zeros((N,), jnp.float32), u=None, c0=0.0,
        prior_mean=jnp.zeros((D,), jnp.float32),
        prior_inv_var=jnp.ones((D,), jnp.float32), ll_scale=1.0,
    )
    # builders, not closures: at MXU scale each mode holds its own copy
    # of the (padded / bf16-cast) design matrix — building all four up
    # front wastes GBs of HBM.  MODES env var filters (comma-separated).
    mode_builders = [
        ("pallas_f32", lambda: fam.value_and_grad(use_pallas=True)),
        ("pallas_bf16", lambda: fam.value_and_grad(use_pallas=True,
                                                   dtype="bf16")),
        ("xla_bf16", lambda: fam.value_and_grad(use_pallas=False,
                                                dtype="bf16")),
        ("xla_f32", lambda: fam.value_and_grad(use_pallas=False)),
    ]
    sel = os.environ.get("MODES")
    if sel:
        keep = set(sel.split(","))
        mode_builders = [(n, b) for n, b in mode_builders if n in keep]
    modes = mode_builders
    flops_eval = 4.0 * C * N * D

    # -- A: bare potential, 32 chained evals (eager scan dispatch) ----------
    z0 = jnp.asarray(rng.uniform(-0.5, 0.5, (C, D)).astype(np.float32))
    for name, build in ([] if SKIP_BARE else modes):
        vg = build()

        def chain32(z, vg=vg):
            def body(carry, _):
                val, grad = vg(carry)
                # data dependency serializes the scan
                return carry + 1e-6 * grad, val
            return jax.lax.scan(body, z, None, length=32)
        r = chain32(z0); jax.block_until_ready(r)
        t0 = time.perf_counter(); r = chain32(z0); jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / 32
        print(f"A bare {name:10s}: {dt*1e3:7.2f} ms/eval  "
              f"{flops_eval/dt/1e12:6.1f} TFLOP/s", flush=True)
        del vg

    # -- B: HMC through sample(), static L ---------------------------------
    model = logistic_regression_model(x, y)
    for name, build in modes:
        vg = build()
        kwargs = dict(
            kernel=HMC(num_integration_steps=L, jitter_steps=False),
            num_samples=DRAWS, num_warmup=WARMUP, num_chains=C,
            key=jax.random.PRNGKey(0), chain_method="vectorized",
            value_and_grad_fn=vg, diagnostics_backend="none",
            jit_runner=False,
        )
        t0 = time.perf_counter()
        res = sample(model, **kwargs)
        t_first = time.perf_counter() - t0
        res = sample(model, **kwargs)
        t_s = float(res.diagnostics["sampler_seconds"])
        n_lf = (WARMUP + DRAWS) * L
        tf = flops_eval * n_lf / t_s / 1e12
        acc = float(res.diagnostics["mean_accept_prob"])
        per_draw = t_s / (WARMUP + DRAWS) * 1e3
        print(f"B HMC  {name:10s}: first {t_first:6.1f}s  sampler {t_s:6.2f}s "
              f"({per_draw:6.1f} ms/draw, {per_draw/L:5.2f} ms/leapfrog)  "
              f"{tf:6.1f} TFLOP/s  accept {acc:.2f}", flush=True)
        del vg, res


if __name__ == "__main__":
    main()
