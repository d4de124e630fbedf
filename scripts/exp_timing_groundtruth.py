"""Timing ground truth on the axon remote backend (round 5).

Round-4 lore (BASELINE.md): a bare block_until_ready on this backend can
return at launch latency for eagerly-dispatched programs.  The engine
measurements (`sampler_seconds` = wall around runner + block_until_ready)
were believed safe because the engine's scan/while is one data-dependent
program — but round-5 runs produced physically impossible rates (f32
N-tiled kernel at 219 TFLOP/s > the ~66 TFLOP/s 3-pass f32 MXU rate), so
this script settles it: it times (a) sample() + block_until_ready
(= sampler_seconds) and (b) the SAME call plus a host np.asarray fetch of
the stats, which cannot complete before the computation does.

Run: MODES=pallas_f32 python scripts/exp_timing_groundtruth.py [C] [N] [draws]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

C, N, D = 1024, 1048576, 1024
L, DRAWS = 16, 32
if len(sys.argv) > 1:
    C = int(sys.argv[1])
if len(sys.argv) > 2:
    N = int(sys.argv[2])
if len(sys.argv) > 3:
    DRAWS = int(sys.argv[3])
MODE = os.environ.get("MODES", "pallas_f32")


def main():
    from brancher_tpu.ops.pallas_glm import FusedFamily
    from brancher_tpu.models.logistic_regression import logistic_regression_model
    from brancher_tpu.inference import sample, HMC

    print("backend:", jax.devices()[0], "mode:", MODE, flush=True)
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
    if MODE == "pallas_f32":
        vg = fam.value_and_grad(use_pallas=True)
    elif MODE == "pallas_bf16":
        vg = fam.value_and_grad(use_pallas=True, dtype="bf16")
    elif MODE == "xla_bf16":
        vg = fam.value_and_grad(use_pallas=False, dtype="bf16")
    else:
        vg = fam.value_and_grad(use_pallas=False)

    model = logistic_regression_model(x, y)
    kwargs = dict(
        kernel=HMC(num_integration_steps=L, jitter_steps=False),
        num_samples=DRAWS, num_warmup=DRAWS, num_chains=C,
        key=jax.random.PRNGKey(0), chain_method="vectorized",
        value_and_grad_fn=vg, diagnostics_backend="none",
        jit_runner=False,
    )
    t0 = time.perf_counter()
    res = sample(model, **kwargs)
    float(np.asarray(res.stats["accept_prob"]).mean())
    print(f"first(+host): {time.perf_counter()-t0:6.1f}s", flush=True)

    flops_lf = 4.0 * C * N * D
    n_lf = 2 * DRAWS * L
    for i in range(3):
        t0 = time.perf_counter()
        res = sample(model, **kwargs)
        t_block = time.perf_counter() - t0  # ~= sampler_seconds + wrapper
        acc = float(np.asarray(res.stats["accept_prob"]).mean())
        t_host = time.perf_counter() - t0
        print(
            f"run {i}: block={t_block:7.2f}s ({flops_lf*n_lf/t_block/1e12:6.1f}"
            f" TF/s)  host={t_host:7.2f}s ({flops_lf*n_lf/t_host/1e12:6.1f}"
            f" TF/s)  sampler_seconds={float(res.diagnostics['sampler_seconds']):7.2f}"
            f"  accept={acc:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
