"""Headline benchmark: NUTS effective-samples/sec on Bayesian logistic
regression (BASELINE.json metric: "effective samples/sec/chip (NUTS)").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference stack is PyTorch eager on CPU (Brancher delegates
all compute to torch; SURVEY.md §0/§6 — no published numbers, so the
baseline is MEASURED here).  Because the reference has no NUTS, the
baseline is constructed the way BASELINE.md prescribes: a reference-frame
oracle — the identical model's leapfrog gradient evaluated in eager
PyTorch on CPU (chains batched, which flatters the baseline), charged for
the same number of leapfrog steps our NUTS actually used, with the same
ESS credited.  vs_baseline = our ESS/sec ÷ oracle ESS/sec.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    # persistent compilation cache: amortize the large first-compile of the
    # NUTS while-loop program across bench invocations
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from brancher_tpu.models.logistic_regression import (
        logistic_regression_model,
        make_logreg_data,
    )
    from brancher_tpu.inference import sample, NUTS

    from brancher_tpu.ops.pallas_logreg import (
        logreg_value_and_grad_pallas,
        logreg_value_and_grad_reference,
    )

    n_points, dim = 1000, 32
    chains, warmup, draws = 1024, 500, 1000
    x, y, _ = make_logreg_data(num_points=n_points, dim=dim, seed=0)
    model = logistic_regression_model(x, y)

    # fused Pallas potential (vectorized chain-batched NUTS consumes the
    # whole [C, d] block -> two MXU matmuls per leapfrog step)
    xj, yj = jnp.asarray(x), jnp.asarray(np.asarray(y, np.float32))
    if jax.default_backend() == "tpu":
        fused = lambda w: logreg_value_and_grad_pallas(w, xj, yj, 1.0)
    else:
        fused = lambda w: logreg_value_and_grad_reference(w, xj, yj, 1.0)

    kwargs = dict(
        kernel=NUTS(max_depth=8),
        num_samples=draws,
        num_warmup=warmup,
        num_chains=chains,
        key=jax.random.PRNGKey(0),
        chain_method="vectorized",
        value_and_grad_fn=fused,
    )

    log(f"backend: {jax.devices()[0].platform} ({jax.devices()[0]})")
    t0 = time.time()
    res = sample(model, **kwargs)
    jax.block_until_ready(res.samples["w"])
    t_compile_run = time.time() - t0
    log(f"first run (compile+run): {t_compile_run:.1f}s")

    t0 = time.time()
    res = sample(model, **kwargs)
    jax.block_until_ready(res.samples["w"])
    t_run = time.time() - t0
    log(f"cached run: {t_run:.1f}s")

    ess = np.asarray(res.diagnostics["ess"]["w"])
    min_ess = float(np.min(ess))
    total_leapfrog = int(res.diagnostics["total_leapfrog_steps"])
    # warmup leapfrog count is not in stats; approximate warmup cost by the
    # same steps/draw rate (conservative: charge it fully).
    total_leapfrog_incl_warmup = total_leapfrog * (warmup + draws) // draws
    ess_per_sec = min_ess / t_run
    log(
        f"min ESS {min_ess:.0f} over {dim} params, divergences "
        f"{int(res.diagnostics['num_divergences'])}, "
        f"leapfrog steps (draws) {total_leapfrog}"
    )

    # ---- PyTorch eager CPU oracle: time per batched leapfrog step -------
    import torch

    xt = torch.tensor(x)
    yt = torch.tensor(np.asarray(y, np.float32))
    wt = torch.zeros((chains, dim), requires_grad=True)

    def torch_neg_log_post(w):
        logits = w @ xt.T  # [chains, N]
        ll = yt * torch.nn.functional.logsigmoid(logits) + (1 - yt) * torch.nn.functional.logsigmoid(-logits)
        lp = -0.5 * (w * w).sum(-1)
        return -(ll.sum(-1) + lp).sum()

    # one leapfrog step = one gradient eval + elementwise updates (eager)
    r = torch.randn(chains, dim)
    n_timed = 50
    # warm
    for _ in range(3):
        loss = torch_neg_log_post(wt)
        (g,) = torch.autograd.grad(loss, wt)
    t0 = time.time()
    for _ in range(n_timed):
        loss = torch_neg_log_post(wt)
        (g,) = torch.autograd.grad(loss, wt)
        with torch.no_grad():
            r = r - 0.5 * 0.01 * g
            wnew = wt + 0.01 * r
        wt = wnew.detach().requires_grad_(True)
    t_torch_step = (time.time() - t0) / n_timed
    log(f"torch eager CPU: {t_torch_step*1e3:.2f} ms / batched leapfrog step")

    # oracle charged for the same trajectory at its own step rate
    baseline_time = (total_leapfrog_incl_warmup / chains) * t_torch_step
    baseline_ess_per_sec = min_ess / baseline_time
    vs_baseline = ess_per_sec / baseline_ess_per_sec

    # ---- secondary metric (stderr): ELBO steps/sec on the VAE config ----
    try:
        from brancher_tpu.models.vae import VAEConfig, make_vae_data, vae_model
        from brancher_tpu.inference import perform_inference

        vdata = make_vae_data(num_points=4096, obs_dim=64)
        p_model, _ = vae_model(vdata, VAEConfig(latent_dim=8, hidden_dim=128,
                                                batch_size=256))
        n_steps = 500
        perform_inference._benchmark = True
        try:
            perform_inference(p_model, number_iterations=n_steps,
                              number_samples=4, lr=1e-3,
                              key=jax.random.PRNGKey(3))
            elbo_sps = n_steps / perform_inference._last_run_seconds
        finally:
            perform_inference._benchmark = False
        # reference-frame oracle: the SAME amortized VAE ELBO step in eager
        # PyTorch on CPU (encoder/decoder MLPs, reparameterized sample,
        # backward, Adam) — the reference's execution model (SURVEY.md §3.4)
        tdata = torch.tensor(vdata)
        enc_mu_t = torch.nn.Sequential(
            torch.nn.Linear(64, 128), torch.nn.ReLU(), torch.nn.Linear(128, 8))
        enc_ls_t = torch.nn.Sequential(
            torch.nn.Linear(64, 128), torch.nn.ReLU(), torch.nn.Linear(128, 8))
        dec_t = torch.nn.Sequential(
            torch.nn.Linear(8, 128), torch.nn.ReLU(), torch.nn.Linear(128, 64))
        opt_t = torch.optim.Adam(
            list(enc_mu_t.parameters()) + list(enc_ls_t.parameters())
            + list(dec_t.parameters()), lr=1e-3)

        def torch_elbo_step():
            idx = torch.randint(0, tdata.shape[0], (256,))
            xb = tdata[idx]
            mu_e = enc_mu_t(xb)
            ls_e = torch.clamp(enc_ls_t(xb), -5, 3)
            elbo = 0.0
            for _ in range(4):  # S=4 MC samples, eager loop like the reference
                zb = mu_e + torch.exp(ls_e) * torch.randn_like(mu_e)
                logits = dec_t(zb)
                ll = -torch.nn.functional.binary_cross_entropy_with_logits(
                    logits, xb, reduction="sum")
                lp_z = -0.5 * (zb * zb).sum()
                lq_z = (-0.5 * ((zb - mu_e) / torch.exp(ls_e)) ** 2 - ls_e).sum()
                elbo = elbo + (ll + lp_z - lq_z) / 4
            loss = -elbo * (tdata.shape[0] / 256.0)
            opt_t.zero_grad(); loss.backward(); opt_t.step()

        for _ in range(3):
            torch_elbo_step()
        t0 = time.time()
        for _ in range(30):
            torch_elbo_step()
        torch_sps = 30 / (time.time() - t0)
        log(f"secondary: VAE ELBO steps/sec = {elbo_sps:.0f} "
            f"(B=256, obs=64, latent=8, S=4); torch-eager-CPU oracle = "
            f"{torch_sps:.0f} -> {elbo_sps / torch_sps:.1f}x")
    except Exception as e:  # secondary metric must never break the bench
        log(f"secondary ELBO metric failed: {e}")

    print(
        json.dumps(
            {
                "metric": f"NUTS min-ESS/sec/chip, Bayesian logreg N={n_points} d={dim}, {chains} chains",
                "value": round(ess_per_sec, 2),
                "unit": "ess/sec",
                "vs_baseline": round(vs_baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
