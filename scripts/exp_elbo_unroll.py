"""VAE ELBO step-cost breakdown via scan unrolling (VERDICT r3 weak #1).

BENCH_r03's secondary metric runs the bench VAE (B=256, obs=64, h=64,
S=1) at ~14.2k steps/sec (~70 us/step) — almost certainly bound by
per-iteration scan/launch overhead rather than compute at these tiny
matmul shapes ([256,64]x[64,64] fwd/bwd ~ 8.6 MFLOP/step ~ 0.2 us of
MXU time).  Sweeping lax.scan's unroll factor separates the two: the
asymptote as unroll grows is the pure compute+bookkeeping cost, and the
unroll=1 gap is the per-iteration overhead.

Run: python scripts/exp_elbo_unroll.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

N_STEPS = 500


def main():
    from brancher_tpu.models.vae import VAEConfig, make_vae_data, vae_model
    from brancher_tpu.inference import perform_inference

    print("backend:", jax.devices()[0], flush=True)
    vdata = make_vae_data(num_points=4096, obs_dim=64)

    for unroll in (1, 2, 4, 8, 16):
        p_model, _ = vae_model(
            vdata, VAEConfig(latent_dim=8, hidden_dim=64, batch_size=256)
        )
        perform_inference._benchmark = True
        t0 = time.time()
        try:
            perform_inference(
                p_model, number_iterations=N_STEPS, number_samples=1,
                lr=1e-3, key=jax.random.PRNGKey(3), scan_unroll=unroll,
            )
            dt = perform_inference._last_run_seconds
        finally:
            perform_inference._benchmark = False
        t_total = time.time() - t0
        print(
            f"unroll={unroll:2d}: {N_STEPS/dt:8.0f} steps/sec  "
            f"({dt/N_STEPS*1e6:6.1f} us/step)  first-call {t_total:6.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
