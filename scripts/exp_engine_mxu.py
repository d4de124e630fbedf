"""Engine-level MXU-bound measurement (closes the BASELINE roofline loop).

The kernel-level roofline (exp_mxu_roofline.py) measured the potential
in isolation; this runs the FULL ChEES-HMC engine (warmup + sampling,
one jitted program) on a synthetic logreg at the N-tiled kernel's
design point (d=1024, N=131072) and compares the three potential modes:

  * fused XLA f32  (the small-shape default)
  * Pallas N-tiled f32 (what use_pallas='auto' now picks at this shape)
  * bf16 multiplies / f32 accumulates (fused_potential='bf16')

Reports sampler seconds, leapfrogs/sec, and achieved TFLOP/s
(4*C*N*d FLOPs per leapfrog's value+grad).  ChEES because it compiles
in ~90 s on axon vs ~340 s for NUTS (CLAUDE.md compile table).

Run: python scripts/exp_engine_mxu.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

C, N, D = 256, 131072, 1024
DRAWS, WARMUP = 50, 100
if len(sys.argv) > 1:
    C = int(sys.argv[1])


def main():
    from brancher_tpu.ops.pallas_glm import FusedFamily
    from brancher_tpu.inference.chees import chees_hmc

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
    # xla_f32 last: at this shape it can be pathologically slow
    # (exp_mxu_roofline: 0.28 TFLOP/s at C=1024) — keep the winners'
    # numbers safe if the budget runs out mid-mode
    modes = [
        ("pallas_f32", fam.value_and_grad(use_pallas=True)),
        ("bf16", fam.value_and_grad(dtype="bf16")),
        ("xla_f32", fam.value_and_grad(use_pallas=False)),
    ]
    z0 = jnp.asarray(rng.uniform(-0.5, 0.5, (C, D)).astype(np.float32))
    flops_per_lf = 4.0 * C * N * D
    for name, vg in modes:
        def run_once(k):
            out = chees_hmc(
                vg, z0, num_warmup=WARMUP, num_samples=DRAWS,
                key=jax.random.PRNGKey(k), max_leapfrog=32,
            )
            jax.block_until_ready(out.samples)
            return out

        t0 = time.perf_counter()
        out = run_once(0)
        total = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = run_once(1)
        run = time.perf_counter() - t0
        n_lf = int(np.asarray(out.num_leapfrog).sum()) + int(
            np.asarray(out.warmup_leapfrog)
        )
        tf = flops_per_lf * n_lf / run / 1e12 if n_lf else float("nan")
        acc = float(np.asarray(out.accept_prob).mean())
        print(
            f"{name:10s}: first(run+compile) {total:7.1f}s  cached run "
            f"{run:6.2f}s  leapfrogs {n_lf}  {tf:6.1f} TFLOP/s  "
            f"accept {acc:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
