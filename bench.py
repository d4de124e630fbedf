"""Headline benchmark: NUTS effective-samples/sec on a hierarchical ARD
Bayesian logistic regression (BASELINE.json metric: "effective
samples/sec/chip (NUTS)").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline promotion (round 4, VERDICT r3 #2): the parsed headline is the
UNSATURATED measurement — hierarchical ARD logreg (non-centered
w = tau * w_raw via NonCenteredNormalVariable, VERDICT r3 #9; 0
divergences at target_accept=0.95, min-ESS genuinely below the
chains*draws cap) — so the number can register round-over-round
sampler-efficiency progress.  The old plain-logreg headline SATURATES
its ESS cap (min_ess = chains*draws three rounds running; its value
only moves with timing noise) and is kept as the `floor_*` companion:
r3 floor = 3,858,193 ess/sec (323.7x oracle).

Structure: the parent process never touches JAX.  It measures BOTH
PyTorch eager-CPU oracles first (the reference's execution substrate,
SURVEY.md §0/§6; the reference publishes no numbers so the baseline is
MEASURED, on an otherwise-idle host), then launches ALL TPU measurement
children CONCURRENTLY:

  1. "ard"   — vectorized NUTS, non-centered ARD logreg (THE HEADLINE)
  2. "ardc"  — ChEES-HMC on the SAME ARD model: unsaturated-headline
               insurance (the ARD NUTS program cold-compiled 577 s on
               2026-08-21 — over budget — while ChEES-class programs
               compile in ~100 s)
  3. "floor" — vectorized NUTS + fused XLA potential on plain logreg
               (the saturated floor companion; headline fallback of
               third resort)
  4. "vae"   — amortized-SVI ELBO steps/sec (VERDICT r2 #1)
  5. "chees" — small-program last-resort fallback, launched only when
               ard, ardc and floor are all lost

Children spend ~95% of their wall time waiting on the remote compile
service with the chip idle; concurrent large compiles contend by a
measured ~1.4x factor but still complete in ~max(compile) x 1.4 rather
than sum-of-compiles (~20 min cold).  The primary JSON line prints
IMMEDIATELY when the headline (or its fallback) lands — before any
secondary metric — so a late hang can never destroy the result; an
enriched copy (same headline numbers plus floor_* / elbo_* keys) prints
at the very end.  Every timed measurement is the best of 3 executions
of one device-atomic XLA program, so concurrent children cannot inflate
each other's numbers via queueing delay.

vs_baseline: the oracle is charged for the same leapfrog trajectory the
sampler actually executed (chains batched into one eager matmul per step,
which flatters the baseline), credited with the same ESS.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_POINTS, DIM = 1000, 32
CHAINS, WARMUP, DRAWS = 1024, 500, 1000
# ARD headline draws (round 5, VERDICT r4 #3): the tuning sweep
# (scripts/exp_headline_tune.py, 2026-08-21) measured W500/D2000 at
# 181-193k ess/sec (43% of cap, 41 divergences, r-hat 1.001) vs the r4
# W500/D1000 baseline's 109k (29%).  Warmup cuts collapse adaptation
# (W300: 32k, div 106), D3000 and target_accept 0.92 both collapse
# min-ESS via divergence-sticky excursions (9-10% cap, div 239/498) —
# D2000 reproduced twice as the sweet spot.  The floor child keeps
# DRAWS=1000 for round-over-round comparability.
ARD_DRAWS = 2000
MAX_DEPTH = 8

# Headline config (round 4, VERDICT r3 #2 + #9): hierarchical ARD logreg
# (w = tau * w_raw NON-CENTERED, tau_j lognormal) with WEAK data —
# genuinely autocorrelated NUTS draws (min-ESS = 29% of chains*draws
# over {w, tau} measured ON CHIP at full 1024x1000 scale,
# scripts/exp_ard_pipelined.py 2026-08-21; 0.42x on CPU prototypes at
# C=32) at ~ZERO divergences: 24 of 1.5M transitions at
# target_accept=0.95 vs 468 for the centered variant at 0.9 in
# BENCH_r03 (funnel geometry).  The metric can therefore register
# sampler-efficiency progress that the saturated plain-logreg floor is
# blind to.  Plain logreg at the floor shape is simply too easy: every
# tested variant (collinear designs to rho=0.9999, scale spreads,
# N=1000 hierarchies) still decorrelated fully within depth-8 trees.
UNSAT_N, UNSAT_TAU_SD, UNSAT_TARGET_ACCEPT = 100, 0.75, 0.95


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ======================================================================
# child mode: everything that touches JAX/TPU runs here
# ======================================================================

def child(engine: str) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np

    from brancher_tpu.models.logistic_regression import (
        logistic_regression_model,
        make_logreg_data,
    )
    from brancher_tpu.inference import sample, NUTS, ChEESHMC
    from brancher_tpu.ops.pallas_logreg import logreg_value_and_grad_reference

    x, y, _ = make_logreg_data(num_points=N_POINTS, dim=DIM, seed=0)
    model = logistic_regression_model(x, y)

    xj, yj = jnp.asarray(x), jnp.asarray(np.asarray(y, np.float32))
    # fused XLA potential: measured faster end-to-end than the Pallas
    # kernel at this shape once retrace overhead was eliminated (0.29 s
    # vs 0.43 s sampler time) — see BASELINE.md round-2 notes
    fused = lambda w: logreg_value_and_grad_reference(w, xj, yj, 1.0)

    kernel = NUTS(max_depth=MAX_DEPTH) if engine == "nuts" else ChEESHMC()
    kwargs = dict(
        kernel=kernel,
        num_samples=DRAWS,
        num_warmup=WARMUP,
        num_chains=CHAINS,
        key=jax.random.PRNGKey(0),
        chain_method="vectorized",
        value_and_grad_fn=fused,
    )

    log(f"[child {engine}] backend: {jax.devices()[0]}")
    t0 = time.time()
    res = sample(model, **kwargs)
    t_first = time.time() - t0
    log(f"[child {engine}] first sample() (compile+run): {t_first:.1f}s")

    # best of 9 cached runs: each is ONE device-atomic program launch,
    # so the min filters any queueing delay from concurrent children
    # (9 not 3: the saturated floor's value is pure 1/denominator on a
    # ~0.3 s program, so per-run contention noise IS the metric's
    # round-to-round movement — it drifted 3.86M -> 3.60M -> 3.34M
    # ess/sec across rounds on timing noise alone; extra reps cost
    # ~1.2 s and tighten the min)
    t_sampler = float("inf")
    for _ in range(9):
        res = sample(model, **kwargs)
        t_sampler = min(t_sampler, float(res.diagnostics["sampler_seconds"]))
    log(f"[child {engine}] cached sampler run (best of 9): {t_sampler:.2f}s")

    ess = np.asarray(res.diagnostics["ess"]["w"])
    out = {
        "engine": engine,
        "min_ess": float(np.min(ess)),
        "ess_cap": float(CHAINS * DRAWS),
        "sampler_seconds": t_sampler,
        "first_seconds": t_first,
        # chain-steps: every chain is charged each shared loop iteration
        "total_chain_steps_draws": int(res.diagnostics["total_leapfrog_steps"]),
        "warmup_steps_per_chain": float(res.diagnostics.get("warmup_leapfrog", 0)),
        "divergences": int(res.diagnostics["num_divergences"]),
        "accept": float(res.diagnostics["mean_accept_prob"]),
    }
    print(json.dumps(out), flush=True)


def child_ard(engine: str = "nuts") -> None:
    """THE HEADLINE: hierarchical ARD logreg, NON-CENTERED (w = tau *
    w_raw via NonCenteredNormalVariable — VERDICT r3 #9), at
    1024 chains x ARD_DRAWS (2000, tuned round 5 — see the constant's
    comment).  min-ESS over {w, tau} genuinely < the chains*draws cap
    (43% measured on chip at full scale), ~0 divergences at
    target_accept=0.95 (41 of 2.5M transitions), so round-over-round
    sampler-efficiency progress is measurable (VERDICT r3 #2).

    engine="chees" is the UNSATURATED-headline insurance: the ARD NUTS
    program cold-compiled in 577 s on 2026-08-21 (over the bench
    budget) while ChEES-class programs compile in ~100 s — if NUTS
    misses the compile lottery, this still lands an honestly-labeled
    unsaturated headline."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np

    import brancher_tpu.functions as BF
    from brancher_tpu import (
        BernoulliVariable, LogNormalVariable, NonCenteredNormalVariable,
        ProbabilisticModel,
    )
    from brancher_tpu.models.logistic_regression import make_logreg_data
    from brancher_tpu.inference import sample, NUTS

    from brancher_tpu.inference import ChEESHMC

    x, y, _ = make_logreg_data(num_points=UNSAT_N, dim=DIM, seed=0)
    tau = LogNormalVariable(jnp.zeros(DIM), UNSAT_TAU_SD * jnp.ones(DIM), "tau")
    w = NonCenteredNormalVariable(0.0, tau, name="w", shape=(DIM,))
    yv = BernoulliVariable(logits=BF.matmul(jnp.asarray(x), w), name="y")
    yv.observe(jnp.asarray(y))
    model = ProbabilisticModel([yv])

    # hand-fused analytic value+grad of the non-centered ARD z-density,
    # numerically VERIFIED against the autodiff walk below before being
    # trusted.  Shrinks the compiled NUTS program (the autodiff-walk
    # variant cold-compiled in 754 s on 2026-08-20; this one is
    # headline-class) and speeds every leapfrog.  z layout (ravel_pytree
    # sorted keys): [:DIM] = tau's unconstrained v = log tau,
    # [DIM:] = w_raw.
    import jax.flatten_util

    xj = jnp.asarray(x)
    yj = jnp.asarray(np.asarray(y, np.float32))
    sd2 = UNSAT_TAU_SD ** 2

    def fused(zc):
        v, wr = zc[:, :DIM], zc[:, DIM:]
        tau_ = jnp.exp(v)
        w_ = wr * tau_
        logits = w_ @ xj.T
        ll = jnp.sum(yj[None, :] * logits - jax.nn.softplus(logits), -1)
        val = (ll - 0.5 * jnp.sum(v * v, -1) / sd2
               - 0.5 * jnp.sum(wr * wr, -1))
        resid = yj[None, :] - jax.nn.sigmoid(logits)
        s = resid @ xj
        gw = s * tau_ - wr
        gv = s * wr * tau_ - v / sd2
        return val, jnp.concatenate([gv, gw], -1)

    comp = model.compiled()
    params = comp.initial_params
    _, unravel = jax.flatten_util.ravel_pytree(comp.z_example())
    auto = jax.vmap(jax.value_and_grad(
        lambda zf: comp.log_density_z(params, unravel(zf))))
    zp = 0.5 * jax.random.normal(jax.random.PRNGKey(9), (3, 2 * DIM))
    va, ga = auto(zp)
    vf, gf = fused(zp)
    const_ok = float(jnp.std(vf - va)) < 1e-2
    grad_ok = bool(jnp.all(jnp.abs(gf - ga) <= 2e-3 * (1.0 + jnp.abs(ga))))
    vg_fn = fused if (const_ok and grad_ok) else None
    log(f"[child ard] fused non-centered ARD potential "
        f"{'verified' if vg_fn else 'MISMATCH - using autodiff'} "
        f"(const_ok={const_ok} grad_ok={grad_ok})")

    kernel = (NUTS(max_depth=MAX_DEPTH) if engine == "nuts"
              else ChEESHMC())
    kwargs = dict(
        kernel=kernel, num_samples=ARD_DRAWS,
        num_warmup=WARMUP, num_chains=CHAINS, key=jax.random.PRNGKey(0),
        chain_method="vectorized", target_accept=UNSAT_TARGET_ACCEPT,
        value_and_grad_fn=vg_fn, ess_vars=["w", "tau"],
    )
    log(f"[child ard:{engine}] backend: {jax.devices()[0]}")
    t0 = time.time()
    res = sample(model, **kwargs)
    t_first = time.time() - t0
    log(f"[child ard:{engine}] first sample() (compile+run): {t_first:.1f}s")
    t_sampler = float("inf")
    for _ in range(3):
        res = sample(model, **kwargs)
        t_sampler = min(t_sampler, float(res.diagnostics["sampler_seconds"]))
    ess = np.concatenate([
        np.ravel(np.asarray(res.diagnostics["ess"][n])) for n in ("w", "tau")
    ])
    out = {
        "engine": f"{engine}_ard_noncentered",
        "min_ess": float(np.min(ess)),
        "ess_cap": float(CHAINS * ARD_DRAWS),
        "sampler_seconds": t_sampler,
        "first_seconds": t_first,
        "total_chain_steps_draws": int(res.diagnostics["total_leapfrog_steps"]),
        "warmup_steps_per_chain": float(res.diagnostics.get("warmup_leapfrog", 0)),
        "divergences": int(res.diagnostics["num_divergences"]),
        "accept": float(res.diagnostics["mean_accept_prob"]),
    }
    print(json.dumps(out), flush=True)


def child_vae() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from brancher_tpu.models.vae import VAEConfig, make_vae_data, vae_model
    from brancher_tpu.inference import perform_inference

    # hidden=64 / S=1 (round 3): compile time on this backend scales
    # with the MLP body (h=128/S=4 cold-compiled 477 s — never fits the
    # driver budget; h=64/S=1 is ~3x smaller); the CPU oracle below
    # measures the IDENTICAL configuration, so vs_baseline is apples to
    # apples.
    vdata = make_vae_data(num_points=4096, obs_dim=64)
    p_model, _ = vae_model(vdata, VAEConfig(latent_dim=8, hidden_dim=64,
                                            batch_size=256))
    n_steps = 500
    perform_inference._benchmark = True
    try:
        perform_inference(p_model, number_iterations=n_steps,
                          number_samples=1, lr=1e-3,
                          key=jax.random.PRNGKey(3))
        elbo_sps = n_steps / perform_inference._last_run_seconds
    finally:
        perform_inference._benchmark = False
    print(json.dumps({"elbo_steps_per_sec": elbo_sps}), flush=True)


# ======================================================================
# parent mode: oracle measurement + orchestration (no JAX here)
# ======================================================================

class Child:
    """A bench child process polled asynchronously.

    The axon backend multiplexes concurrent processes on the one chip
    — while a child compiles, the chip sits idle.  The remote compile
    service runs concurrent SMALL jobs without slowdown (1.6/1.8 s
    concurrent vs 1.5 s solo) and concurrent LARGE jobs with ~1.4x
    contention (nuts needed ~500 s alongside two siblings vs 337 s
    solo), so concurrency still beats the serial sum by far: measured
    full-cold compiles on 2026-08-20 were nuts 337 s, vae 477 s
    (h128/S4; the bench now uses the ~3x-smaller h64/S1), unsat 754 s
    autodiff (now hand-fused to headline-class).  The service does NOT
    cache across processes, contrary to the round-2 lore — re-measured
    twice.  Each child's TIMED measurement is a single XLA program
    launch (device-atomic) taken as the best of 3 runs, so cross-child
    queueing delay cannot inflate it.
    """

    def __init__(self, name: str, args):
        import tempfile

        self.name = name
        self.args = args
        self.outfile = tempfile.NamedTemporaryFile(
            mode="w+b", suffix=f"_{name}.out", delete=False
        )
        cmd = [sys.executable, os.path.abspath(__file__)] + args
        self.t0 = time.time()
        self.proc = subprocess.Popen(cmd, stdout=self.outfile, stderr=sys.stderr)
        self.result = None
        self.done = False
        log(f"[parent] launched {name}")

    def poll(self):
        """None while running; on exit, the parsed last JSON line (or
        None if the child failed) — cached."""
        if self.done:
            return self.result
        if self.proc.poll() is None:
            return None
        self.done = True
        dt = time.time() - self.t0
        try:
            with open(self.outfile.name, "rb") as f:
                lines = [l for l in f.read().decode().splitlines() if l.strip()]
            self.result = json.loads(lines[-1]) if lines else None
        except Exception as e:
            log(f"[parent] {self.name} unparseable output: {e}")
            self.result = None
        if self.proc.returncode != 0:
            log(f"[parent] {self.name} failed rc={self.proc.returncode} "
                f"after {dt:.0f}s")
            self.result = None
        elif self.result is not None:
            log(f"[parent] {self.name} finished in {dt:.0f}s")
        return self.result

    def kill(self):
        if self.proc.poll() is None:
            self.proc.kill()  # exact PID we own
            log(f"[parent] killed {self.name} after "
                f"{time.time()-self.t0:.0f}s")


def torch_leapfrog_oracle_step_seconds() -> float:
    """Eager PyTorch CPU: seconds per chains-batched leapfrog step
    (gradient eval + elementwise updates), the reference's execution
    model (SURVEY.md §3.4: eager torch, autograd)."""
    import numpy as np
    import torch

    rng = np.random.RandomState(0)
    x = rng.normal(0, 1, size=(N_POINTS, DIM)).astype(np.float32)
    y = (rng.uniform(size=N_POINTS) < 0.5).astype(np.float32)
    xt, yt = torch.tensor(x), torch.tensor(y)
    wt = torch.zeros((CHAINS, DIM), requires_grad=True)

    def neg_log_post(w):
        logits = w @ xt.T
        ll = yt * torch.nn.functional.logsigmoid(logits) + (
            1 - yt
        ) * torch.nn.functional.logsigmoid(-logits)
        return -(ll.sum(-1) - 0.5 * (w * w).sum(-1)).sum()

    r = torch.randn(CHAINS, DIM)
    for _ in range(3):
        (g,) = torch.autograd.grad(neg_log_post(wt), wt)
    n_timed = 30
    t0 = time.time()
    for _ in range(n_timed):
        (g,) = torch.autograd.grad(neg_log_post(wt), wt)
        with torch.no_grad():
            r = r - 0.5 * 0.01 * g
            wnew = wt + 0.01 * r
        wt = wnew.detach().requires_grad_(True)
    return (time.time() - t0) / n_timed


def torch_ard_oracle_step_seconds() -> float:
    """Eager PyTorch CPU: seconds per chains-batched leapfrog step on the
    headline config's NON-CENTERED hierarchical ARD logreg potential
    (w_raw, log-tau) — the identical parameterization the TPU child
    samples, so vs_baseline is apples to apples."""
    import numpy as np
    import torch

    rng = np.random.RandomState(0)
    x = rng.normal(0, 1, size=(UNSAT_N, DIM)).astype(np.float32)
    y = (rng.uniform(size=UNSAT_N) < 0.5).astype(np.float32)
    xt, yt = torch.tensor(x), torch.tensor(y)
    theta = torch.zeros((CHAINS, 2 * DIM), requires_grad=True)

    def neg_log_post(th):
        v, wr = th[:, :DIM], th[:, DIM:]  # v = log tau
        w = wr * torch.exp(v)
        logits = w @ xt.T
        ll = yt * torch.nn.functional.logsigmoid(logits) + (
            1 - yt
        ) * torch.nn.functional.logsigmoid(-logits)
        lp_wr = -0.5 * (wr * wr).sum(-1)
        lp_v = -0.5 * ((v / UNSAT_TAU_SD) ** 2).sum(-1)
        return -(ll.sum(-1) + lp_wr + lp_v).sum()

    r = torch.randn(CHAINS, 2 * DIM)
    for _ in range(3):
        (g,) = torch.autograd.grad(neg_log_post(theta), theta)
    n_timed = 30
    t0 = time.time()
    for _ in range(n_timed):
        (g,) = torch.autograd.grad(neg_log_post(theta), theta)
        with torch.no_grad():
            r = r - 0.5 * 0.01 * g
            tnew = theta + 0.01 * r
        theta = tnew.detach().requires_grad_(True)
    return (time.time() - t0) / n_timed


def torch_vae_oracle_steps_per_sec() -> float:
    import numpy as np
    import torch

    rng = np.random.RandomState(1)
    tdata = torch.tensor(
        (rng.uniform(size=(4096, 64)) < 0.3).astype(np.float32))
    enc_mu = torch.nn.Sequential(
        torch.nn.Linear(64, 64), torch.nn.ReLU(), torch.nn.Linear(64, 8))
    enc_ls = torch.nn.Sequential(
        torch.nn.Linear(64, 64), torch.nn.ReLU(), torch.nn.Linear(64, 8))
    dec = torch.nn.Sequential(
        torch.nn.Linear(8, 64), torch.nn.ReLU(), torch.nn.Linear(64, 64))
    opt = torch.optim.Adam(
        list(enc_mu.parameters()) + list(enc_ls.parameters())
        + list(dec.parameters()), lr=1e-3)

    def step():
        idx = torch.randint(0, tdata.shape[0], (256,))
        xb = tdata[idx]
        mu_e = enc_mu(xb)
        ls_e = torch.clamp(enc_ls(xb), -5, 3)
        elbo = 0.0
        for _ in range(1):  # S=1 MC sample (matches the TPU child)
            zb = mu_e + torch.exp(ls_e) * torch.randn_like(mu_e)
            logits = dec(zb)
            ll = -torch.nn.functional.binary_cross_entropy_with_logits(
                logits, xb, reduction="sum")
            lp_z = -0.5 * (zb * zb).sum()
            lq_z = (-0.5 * ((zb - mu_e) / torch.exp(ls_e)) ** 2 - ls_e).sum()
            elbo = elbo + (ll + lp_z - lq_z)
        loss = -elbo * (tdata.shape[0] / 256.0)
        opt.zero_grad(); loss.backward(); opt.step()

    for _ in range(3):
        step()
    t0 = time.time()
    for _ in range(30):
        step()
    return 30 / (time.time() - t0)


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        if sys.argv[2] == "vae":
            child_vae()
        elif sys.argv[2] == "ard":
            child_ard("nuts")
        elif sys.argv[2] == "ardc":
            child_ard("chees")
        else:
            child(sys.argv[2])
        return

    t_start = time.time()
    total_budget = float(os.environ.get("BENCH_TOTAL_BUDGET", 560))
    deadline = t_start + total_budget

    # -- 1. reference-frame oracles (fast, CPU-only, measured BEFORE the
    # children load the host — the oracle is load-sensitive) ------------
    t_torch_ard = torch_ard_oracle_step_seconds()
    t_torch_step = torch_leapfrog_oracle_step_seconds()
    log(f"torch eager CPU: ARD {t_torch_ard*1e3:.2f} ms, plain logreg "
        f"{t_torch_step*1e3:.2f} ms / batched leapfrog step")

    # -- 2. ALL children launch concurrently (see Child docstring): the
    # wall-clock cost is ~max(compile times) x a measured ~1.4x
    # contention factor (the service partially serializes concurrent
    # large jobs), still far below their sum.  The floor child doubles
    # as the headline fallback; ChEES (an ~85 s-class program) launches
    # only when both bigger programs are lost.
    children = {
        "ard": Child("ard", ["--child", "ard"]),
        "ardc": Child("ardc", ["--child", "ardc"]),
        "vae": Child("vae", ["--child", "vae"]),
        # the floor companion launches DEFERRED (t+150s, or immediately
        # if ard crashes): in the 2026-08-21 dry run four concurrent
        # children pushed the slow-to-compile vae child past the
        # budget, and the floor is the least valuable of the four
        "floor": None,
    }
    chees = None
    r = None
    headline_kind = None  # "ard" | "ardc" | "floor" | "chees"
    rac = None  # ChEES-ARD insurance result, whenever it lands
    rf = None  # floor result, whenever it lands
    while time.time() < deadline - 45:
        ra = children["ard"].poll()
        if ra is not None:
            r, headline_kind = ra, "ard"
            break
        rac = rac or children["ardc"].poll()
        ard_dead = children["ard"].done
        if children["floor"] is None and (
            time.time() > t_start + 150 or ard_dead
        ):
            children["floor"] = Child("floor", ["--child", "nuts"])
        rf = rf or (children["floor"].poll() if children["floor"] else None)
        if ard_dead and rac is not None:
            # ard crashed; the ChEES-ARD insurance is still an
            # UNSATURATED, honestly-labeled headline
            r, headline_kind = rac, "ardc"
            break
        if ard_dead and children["ardc"].done and rf is not None:
            r, headline_kind = rf, "floor"
            break
        every_unsat_dead = (ard_dead and children["ardc"].done
                            and rac is None)
        floor_dead = (children["floor"] is not None
                      and children["floor"].done and rf is None)
        if chees is None and every_unsat_dead and floor_dead:
            # last-resort INSURANCE: the compile cache is a small laggy
            # LRU (the ARD NUTS program hit 11.6 s and missed 577 s on
            # 2026-08-21) — the ~85 s-class plain-logreg ChEES program
            # still rescues a landed, honestly-labeled headline
            log("[parent] all headline children lost; launching chees")
            chees = Child("chees", ["--child", "chees"])
        if chees is not None:
            cr = chees.poll()
            if cr is not None:
                r, headline_kind = cr, "chees"
                break
            if chees.done and cr is None:
                break  # everything crashed
        time.sleep(2.0)
    if r is None:
        # deadline-45 reached with ard still compiling: take what
        # landed, preferring the unsaturated ChEES-ARD measurement
        rac = rac or children["ardc"].poll()
        rf = rf or (children["floor"].poll() if children["floor"] else None)
        cr = chees.poll() if chees is not None else None
        if rac is not None:
            r, headline_kind = rac, "ardc"
        elif rf is not None:
            r, headline_kind = rf, "floor"
        elif cr is not None:
            r, headline_kind = cr, "chees"
    if chees is not None:
        chees.kill()
    if r is None:
        for name in ("ard", "ardc", "floor"):
            if children[name] is not None:
                children[name].kill()
        # print a parseable failure line NOW; keep collecting secondaries
        print(json.dumps({
            "metric": "NUTS min-ESS/sec/chip (engines timed out)",
            "value": 0.0, "unit": "ess/sec", "vs_baseline": 0.0,
        }), flush=True)
        rv = None
        while time.time() < deadline - 10:
            rv = children["vae"].poll()
            if children["vae"].done:
                break
            time.sleep(2.0)
        children["vae"].kill()
        if rv is not None:
            log(f"secondary (headline missed): VAE ELBO steps/sec = "
                f"{rv['elbo_steps_per_sec']:.0f}")
        return

    ess_per_sec = r["min_ess"] / r["sampler_seconds"]

    # oracle charged the same trajectory at its own step rate, on the
    # identical parameterization (non-centered ARD vs plain logreg)
    ard_headline = headline_kind in ("ard", "ardc")
    t_oracle = t_torch_ard if ard_headline else t_torch_step
    total_chain_steps = (
        r["total_chain_steps_draws"] + r["warmup_steps_per_chain"] * CHAINS
    )
    baseline_time = (total_chain_steps / CHAINS) * t_oracle
    vs_baseline = ess_per_sec / (r["min_ess"] / baseline_time)

    if ard_headline:
        label = "NUTS" if headline_kind == "ard" else "ChEES-HMC"
        metric = (
            f"{label} min-ESS/sec/chip, hierarchical ARD logreg "
            f"(non-centered, min over w/tau) N={UNSAT_N} d={DIM}, "
            f"{CHAINS} chains x {ARD_DRAWS} draws"
        )
    else:
        label = "NUTS" if r["engine"] == "nuts" else "ChEES-HMC"
        metric = (
            f"{label} min-ESS/sec/chip, Bayesian logreg "
            f"N={N_POINTS} d={DIM}, {CHAINS} chains x {DRAWS} draws "
            f"(SATURATED floor fallback — ard headline child missed)"
        )
    primary = {
        "metric": metric,
        "value": round(ess_per_sec, 2),
        "unit": "ess/sec",
        "vs_baseline": round(vs_baseline, 2),
        # headline progress-sensitivity evidence (VERDICT r3 #2):
        # min_ess < 0.9 * ess_cap when the ard child lands
        "min_ess": round(r["min_ess"], 1),
        "ess_cap": r["ess_cap"],
        "divergences": r["divergences"],
    }
    # hang-safety: the primary line prints IMMEDIATELY; an enriched copy
    # (same schema + secondary-metric keys) prints at the very end, so a
    # parser taking either the first or the last JSON line gets the same
    # headline numbers
    print(json.dumps(primary), flush=True)

    # -- 3. post-hoc detail (stderr only, never blocks the JSON) --------
    saturated = r["min_ess"] >= r["ess_cap"] - 0.5
    log(
        f"detail: engine={r['engine']} min_ess={r['min_ess']:.0f}"
        f"{' (SATURATES chains*draws cap — true rate higher)' if saturated else ''}"
        f" sampler={r['sampler_seconds']:.2f}s first={r['first_seconds']:.1f}s"
        f" accept={r['accept']:.3f} divergences={r['divergences']}"
    )
    # FLOP accounting for the fused potential: per chain-leapfrog-step the
    # value+grad kernel does 2 matmuls -> 4*N*d FLOPs (+O(N) elementwise)
    n_data = UNSAT_N if ard_headline else N_POINTS
    flops_draws = r["total_chain_steps_draws"] * (
        4.0 * n_data * DIM + 12.0 * n_data
    )
    tflops = flops_draws / max(r["sampler_seconds"], 1e-9) / 1e12
    log(
        f"roofline: {tflops:.2f} TFLOP/s achieved in the sampling phase "
        f"(f32 data; v5e bf16 peak 197 TFLOP/s -> {100*tflops/197:.1f}% of "
        f"bf16 peak; small-d matmuls [{CHAINS},{DIM}]x[{DIM},{n_data}] "
        f"are latency/VPU-bound — the MXU-bound engine demonstration "
        f"lives at d=1024, scripts/exp_engine_mxu2.py + BASELINE.md)"
    )

    # -- 4. secondary metrics: poll the concurrently-launched children --
    if children["floor"] is None:  # headline landed before the deferral
        children["floor"] = Child("floor", ["--child", "nuts"])
    rv = None
    while time.time() < deadline - 12:
        rv = children["vae"].poll()
        rf = rf or children["floor"].poll()
        if children["vae"].done and children["floor"].done:
            break
        time.sleep(2.0)
    for name in ("vae", "floor", "ard", "ardc"):
        if children[name] is not None:
            children[name].kill()
    rv = rv or children["vae"].poll()
    rf = rf or children["floor"].poll()

    if rv is not None:
        torch_sps = torch_vae_oracle_steps_per_sec()
        log(
            f"secondary: VAE ELBO steps/sec = {rv['elbo_steps_per_sec']:.0f} "
            f"(B=256, obs=64, latent=8, hidden=64, S=1); torch oracle = "
            f"{torch_sps:.0f} -> {rv['elbo_steps_per_sec']/torch_sps:.1f}x"
        )
        primary["elbo_steps_per_sec"] = round(rv["elbo_steps_per_sec"], 1)
        primary["elbo_vs_baseline"] = round(rv["elbo_steps_per_sec"] / torch_sps, 2)
    else:
        log("secondary: VAE child did not finish within budget")

    # -- 5. saturated floor companion (the r1-r3 headline; its min-ESS
    # = chains*draws cap, so its value only moves with timing noise —
    # kept as the floor documented alongside, VERDICT r3 #2) ------------
    if rf is not None and ard_headline:
        floor_eps = rf["min_ess"] / rf["sampler_seconds"]
        floor_steps = (rf["total_chain_steps_draws"] / CHAINS +
                       rf["warmup_steps_per_chain"])
        floor_vs = floor_eps / (rf["min_ess"] / max(
            floor_steps * t_torch_step, 1e-9))
        log(
            f"floor: plain logreg N={N_POINTS} d={DIM} "
            f"min_ess={rf['min_ess']:.0f} of cap {rf['ess_cap']:.0f} "
            f"(SATURATED) sampler={rf['sampler_seconds']:.2f}s -> "
            f"{floor_eps:.0f} ess/sec ({floor_vs:.0f}x torch-eager oracle); "
            f"r3 floor was 3858193 ess/sec"
        )
        primary["floor_ess_per_sec"] = round(floor_eps, 1)
        primary["floor_ess_cap"] = rf["ess_cap"]
        primary["floor_min_ess"] = round(rf["min_ess"], 1)
        primary["floor_vs_baseline"] = round(floor_vs, 2)
    elif ard_headline:
        log("floor companion: did not finish within budget")

    # -- 6. enriched final JSON (same headline, extra keys) -------------
    if len(primary) > 7:
        print(json.dumps(primary), flush=True)


if __name__ == "__main__":
    main()
