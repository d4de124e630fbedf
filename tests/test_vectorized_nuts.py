"""Vectorized (chain-batched) NUTS: exactness vs analytic targets and
agreement with the general per-chain engine."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brancher_tpu.inference.vectorized_nuts import nuts_batched
from brancher_tpu.inference import sample, NUTS, HMC


def test_gaussian_target_moments(key):
    """N(1, 2 I) target: exact mean/variance recovery."""

    def vg(z):
        return -0.25 * jnp.sum((z - 1.0) ** 2, -1), -0.5 * (z - 1.0)

    z0 = jax.random.normal(key, (64, 3))
    res = jax.jit(
        lambda k: nuts_batched(vg, z0, 300, 500, k, max_depth=8)
    )(jax.random.PRNGKey(1))
    assert abs(float(jnp.mean(res.samples)) - 1.0) < 0.05
    assert abs(float(jnp.var(res.samples)) - 2.0) < 0.15
    assert 0.6 < float(jnp.mean(res.accept_prob)) <= 1.0


def test_correlated_gaussian(key):
    """Anisotropic target exercises the mass adaptation."""
    scales = jnp.asarray([0.1, 1.0, 10.0])

    def vg(z):
        val = -0.5 * jnp.sum((z / scales) ** 2, -1)
        return val, -z / scales**2

    z0 = 0.1 * jax.random.normal(key, (64, 3))
    res = jax.jit(
        lambda k: nuts_batched(vg, z0, 500, 500, k, max_depth=9)
    )(jax.random.PRNGKey(2))
    var = jnp.var(res.samples.reshape(-1, 3), axis=0)
    np.testing.assert_allclose(np.asarray(var), np.asarray(scales) ** 2,
                               rtol=0.3)


@pytest.mark.slow
def test_vectorized_default_matches_vmap_engine(key):
    """sample() default (vectorized) must agree with chain_method='vmap'."""
    from brancher_tpu.models.conjugate import conjugate_normal_model

    model, truth = conjugate_normal_model(num_obs=20)
    r_vec = sample(model, kernel=NUTS(max_depth=6), num_samples=600,
                   num_warmup=400, num_chains=8, key=key)
    r_gen = sample(model, kernel=NUTS(max_depth=6), num_samples=600,
                   num_warmup=400, num_chains=4, key=key, chain_method="vmap")
    m_v = float(jnp.mean(r_vec.samples["mu"]))
    m_g = float(jnp.mean(r_gen.samples["mu"]))
    assert abs(m_v - truth["post_mean"]) < 0.05
    assert abs(m_v - m_g) < 0.05
    v_v = float(jnp.var(r_vec.samples["mu"]))
    assert abs(v_v - truth["post_var"]) < 0.03


@pytest.mark.slow
def test_vectorized_sharded(key):
    from brancher_tpu.parallel import chain_mesh
    from brancher_tpu.models.conjugate import conjugate_normal_model

    model, truth = conjugate_normal_model(num_obs=20)
    res = sample(model, kernel=NUTS(max_depth=6), num_samples=400,
                 num_warmup=400, num_chains=16, key=key, mesh=chain_mesh())
    assert res.samples["mu"].shape[:2] == (16, 400)
    assert abs(float(jnp.mean(res.samples["mu"])) - truth["post_mean"]) < 0.06


def test_vectorized_hmc_kernel(key):
    from brancher_tpu.models.conjugate import conjugate_normal_model

    model, truth = conjugate_normal_model(num_obs=20)
    res = sample(model, kernel=HMC(num_integration_steps=16), num_samples=600,
                 num_warmup=400, num_chains=8, key=key)
    assert abs(float(jnp.mean(res.samples["mu"])) - truth["post_mean"]) < 0.05
    assert abs(float(jnp.var(res.samples["mu"])) - truth["post_var"]) < 0.03


def test_constrained_latents_through_vectorized(key):
    """LogNormal latent (exp transform) via the vectorized engine."""
    from brancher_tpu import LogNormalVariable, NormalVariable, ProbabilisticModel

    s = LogNormalVariable(0.0, 0.5, "s")
    x = NormalVariable(0.0, s, "x")
    x.observe(np.random.RandomState(0).normal(0, 1.3, 100).astype(np.float32))
    model = ProbabilisticModel([x])
    res = sample(model, kernel=NUTS(max_depth=7), num_samples=500,
                 num_warmup=500, num_chains=8, key=key)
    s_mean = float(jnp.mean(res.samples["s"]))
    assert 1.1 < s_mean < 1.5, s_mean  # concentrates near sample std
    assert np.all(np.asarray(res.samples["s"]) > 0)


def test_batched_step_size_probe_stiff_target(key):
    """Hoffman-Gelman alg.4 parity for the chain-batched path (VERDICT r1
    weak #6): on a stiff target (tiny scales) the probe must come back
    orders of magnitude below the old 0.5 clamp, with a reasonable
    one-step accept at the returned step."""
    import jax
    from brancher_tpu.inference.adaptation import (
        find_reasonable_step_size_batched,
    )

    scale = 0.01

    def vg(z):
        return -0.5 * jnp.sum((z / scale) ** 2, -1), -z / scale**2

    c, d = 64, 4
    z = scale * jax.random.normal(key, (c, d))
    inv_mass = jnp.ones((d,))
    eps = find_reasonable_step_size_batched(vg, z, inv_mass,
                                            jax.random.PRNGKey(1))
    eps = float(eps)
    assert eps < 0.1  # the 0.5 clamp would be ~50 sigma
    # one-step accept at the probed step is sane (not ~0 as at 0.5)
    r = jax.random.normal(jax.random.PRNGKey(2), (c, d))
    val0, g0 = vg(z)
    h0 = -val0 + 0.5 * jnp.sum(r * r, -1)
    r1 = r + 0.5 * eps * g0
    z1 = z + eps * r1
    val1, g1 = vg(z1)
    r2 = r1 + 0.5 * eps * g1
    h1 = -val1 + 0.5 * jnp.sum(r2 * r2, -1)
    acc = float(jnp.mean(jnp.exp(jnp.minimum(h0 - h1, 0.0))))
    assert acc > 0.3


@pytest.mark.slow
def test_probe_feeds_vectorized_warmup(key):
    """Short-warmup NUTS on a stiff target must reach near-target accept
    thanks to the probed init (the 0.5 clamp burns the whole warmup)."""
    from brancher_tpu.inference.vectorized_nuts import nuts_batched

    scale = jnp.asarray([0.01, 0.01, 0.01])

    def vg(z):
        return -0.5 * jnp.sum((z / scale) ** 2, -1), -z / scale**2

    z0 = 0.01 * jax.random.normal(key, (32, 3))
    from brancher_tpu.inference.adaptation import (
        find_reasonable_step_size_batched,
    )
    eps0 = find_reasonable_step_size_batched(vg, z0, jnp.ones((3,)),
                                             jax.random.PRNGKey(3))
    res_probe = jax.jit(lambda k: nuts_batched(
        vg, z0, 50, 100, k, max_depth=6, init_step_size=eps0))(
        jax.random.PRNGKey(4))
    res_clamp = jax.jit(lambda k: nuts_batched(
        vg, z0, 50, 100, k, max_depth=6, init_step_size=0.5))(
        jax.random.PRNGKey(4))
    acc_probe = float(jnp.mean(res_probe.accept_prob))
    acc_clamp = float(jnp.mean(res_clamp.accept_prob))
    assert abs(acc_probe - 0.8) < 0.15
    assert abs(acc_probe - 0.8) <= abs(acc_clamp - 0.8) + 0.02


@pytest.mark.slow
def test_dense_mass_preconditioning_correlated_target(key):
    """mass='dense' (whitening preconditioner) on a strongly correlated
    Gaussian: ESS must beat the diagonal-mass run by a wide margin and
    the posterior covariance must be recovered (ROADMAP r1 #7)."""
    from brancher_tpu import MultivariateNormalVariable, NormalVariable, ProbabilisticModel
    from brancher_tpu.inference import NUTS, sample

    rho, d = 0.99, 4
    cov = np.full((d, d), rho, np.float32) + (1 - rho) * np.eye(d, dtype=np.float32)
    z = MultivariateNormalVariable(jnp.zeros(d), covariance_matrix=jnp.asarray(cov),
                                   name="z")
    model = ProbabilisticModel([z])

    kwargs = dict(kernel=NUTS(max_depth=7), num_samples=400, num_warmup=400,
                  num_chains=8, key=key)
    res_diag = sample(model, mass="diag", **kwargs)
    res_dense = sample(model, mass="dense", **kwargs)

    ess_diag = float(np.min(np.asarray(res_diag.diagnostics["ess"]["z"])))
    ess_dense = float(np.min(np.asarray(res_dense.diagnostics["ess"]["z"])))
    assert ess_dense > 2.0 * ess_diag, (ess_dense, ess_diag)

    draws = np.asarray(res_dense.samples["z"]).reshape(-1, d)
    emp = np.cov(draws.T)
    np.testing.assert_allclose(emp, cov, atol=0.15)
    assert res_dense.diagnostics["inv_mass"].shape == (d, d)


@pytest.mark.slow
def test_runner_cache_no_false_sharing(key):
    """Regression for the memoized jitted runners: two models with
    IDENTICAL shapes/kernel/settings must not share a traced program —
    the potential is baked into the trace, so a false cache hit would
    silently sample the wrong posterior."""
    from brancher_tpu import NormalVariable, ProbabilisticModel
    from brancher_tpu.inference import NUTS, sample

    def build(loc):
        mu = NormalVariable(0.0, 5.0, "mu")
        x = NormalVariable(mu, 0.3, "x", plate_shape=(20,))
        x.observe(jnp.full((20,), loc, jnp.float32))
        return ProbabilisticModel([x])

    kwargs = dict(kernel=NUTS(max_depth=6), num_samples=200, num_warmup=200,
                  num_chains=4, key=key)
    m_a = sample(build(3.0), **kwargs)
    m_b = sample(build(-3.0), **kwargs)
    a = float(jnp.mean(m_a.samples["mu"]))
    b = float(jnp.mean(m_b.samples["mu"]))
    assert abs(a - 3.0) < 0.3, a
    assert abs(b + 3.0) < 0.3, b

    # and a true repeat DOES hit the cache (same compiled runner object)
    from brancher_tpu.inference.mcmc import _RUNNER_CACHE

    n_before = len(_RUNNER_CACHE)
    model = build(1.0)
    sample(model, **kwargs)
    n_mid = len(_RUNNER_CACHE)
    sample(model, **kwargs)
    assert len(_RUNNER_CACHE) == n_mid > n_before - 1


# -- draw-pipelined sampling (ROADMAP r2 #10) ----------------------------

from brancher_tpu import NormalVariable, ProbabilisticModel


@pytest.mark.slow
def test_pipelined_nuts_conjugate_moments(key):
    """Pipelined engine must reproduce the exact conjugate posterior."""
    obs = np.random.RandomState(0).randn(16).astype(np.float32) + 1.5
    mu = NormalVariable(0.0, 2.0, "mu")
    x = NormalVariable(mu, 1.0, "x", plate_shape=(16,))
    x.observe(obs)
    m = ProbabilisticModel([x])
    v_post = 1.0 / (0.25 + 16)
    m_post = v_post * obs.sum()
    res = sample(m, kernel=NUTS(max_depth=8, pipelined=True),
                 num_samples=1500, num_warmup=500, num_chains=8, key=key)
    s = np.asarray(res.samples["mu"])
    se = np.sqrt(v_post / max(float(np.asarray(res.diagnostics["ess"]["mu"])), 1))
    assert abs(s.mean() - m_post) < 5 * se + 0.02, (s.mean(), m_post)
    assert abs(s.var() - v_post) < 0.25 * v_post, (s.var(), v_post)
    assert float(res.diagnostics["r_hat"]["mu"]) < 1.02
    assert int(res.diagnostics["num_divergences"]) == 0
    assert res.samples["mu"].shape == (8, 1500)


@pytest.mark.slow
def test_pipelined_matches_lockstep_on_funnel(key):
    """Eight-schools geometry: pipelined and lockstep engines agree on
    posterior moments (same seed, different-but-valid RNG streams)."""
    from brancher_tpu import HalfCauchyVariable

    mu = NormalVariable(0.0, 5.0, "mu")
    tau = HalfCauchyVariable(5.0, "tau")
    theta = NormalVariable(mu, tau, "theta", plate_shape=(8,))
    sigma = np.asarray([15., 10., 16., 11., 9., 11., 10., 18.], np.float32)
    obs = NormalVariable(theta, sigma, "y")
    obs.observe(np.asarray([28., 8., -3., 7., -1., 1., 18., 12.], np.float32))
    m = ProbabilisticModel([obs])
    kw = dict(num_samples=800, num_warmup=500, num_chains=16, key=key)
    r_lock = sample(m, kernel=NUTS(max_depth=9), **kw)
    r_pipe = sample(m, kernel=NUTS(max_depth=9, pipelined=True), **kw)
    for name in ("mu", "tau"):
        a = float(np.mean(np.asarray(r_lock.samples[name])))
        b = float(np.mean(np.asarray(r_pipe.samples[name])))
        assert abs(a - b) < 0.75, (name, a, b)
    # pipelined must do fewer total loop iterations than lockstep on a
    # geometry with heterogeneous tree sizes
    it_lock = int(np.sum(np.asarray(r_lock.stats["num_steps"][0])))
    it_pipe = int(np.sum(np.asarray(r_pipe.stats["num_steps"][0])))
    assert it_pipe < it_lock, (it_pipe, it_lock)


@pytest.mark.slow
def test_pipelined_tiny_lookahead_ring(key):
    """lookahead=2 forces constant ring backpressure (chains stall the
    moment they get 2 draws ahead): every output row must still be a
    real draw — the flush path may never leave partial/dump data in the
    output buffers (ROADMAP r3 #4 ring write path)."""
    obs = np.random.RandomState(1).randn(16).astype(np.float32) + 1.5
    mu = NormalVariable(0.0, 2.0, "mu")
    x = NormalVariable(mu, 1.0, "x", plate_shape=(16,))
    x.observe(obs)
    m = ProbabilisticModel([x])
    v_post = 1.0 / (0.25 + 16)
    m_post = v_post * obs.sum()
    res = sample(m, kernel=NUTS(max_depth=8, pipelined=True, lookahead=2),
                 num_samples=1000, num_warmup=500, num_chains=8, key=key)
    s = np.asarray(res.samples["mu"])
    assert s.shape == (8, 1000)
    # a missed flush would leave initialized-to-zero rows: with a
    # posterior centered at ~1.45 and sd ~0.25, exact zeros are
    # impossible draws
    assert np.all(np.abs(s) > 1e-12)
    # draws within each chain must not repeat in long runs (a stuck ring
    # slot would duplicate rows); allow the rare genuine MH rejection
    dup_frac = np.mean(s[:, 1:] == s[:, :-1])
    assert dup_frac < 0.2, dup_frac
    assert abs(s.mean() - m_post) < 0.05, (s.mean(), m_post)
    assert abs(s.var() - v_post) < 0.3 * v_post, (s.var(), v_post)


@pytest.mark.slow
def test_jit_runner_false_statistical_parity(key):
    """sample(jit_runner=False) — eager engine dispatch for models whose
    closed-over data overflows remote-compile payload limits — must run
    the same algorithm: posterior moments agree with the jitted runner
    (bit-equality is NOT guaranteed: fusion boundaries differ, so
    trajectories drift in low-order bits)."""
    obs = np.random.RandomState(2).randn(24).astype(np.float32) + 1.0
    mu = NormalVariable(0.0, 2.0, "mu")
    x = NormalVariable(mu, 1.0, "x", plate_shape=(24,))
    x.observe(obs)
    m = ProbabilisticModel([x])
    kw = dict(kernel=NUTS(max_depth=8), num_samples=600, num_warmup=400,
              num_chains=8, key=key)
    r_j = sample(m, **kw)
    r_e = sample(m, jit_runner=False, **kw)
    a = float(np.mean(np.asarray(r_j.samples["mu"])))
    b = float(np.mean(np.asarray(r_e.samples["mu"])))
    v_post = 1.0 / (0.25 + 24)
    assert abs(a - b) < 4 * np.sqrt(v_post / 600), (a, b)
    assert float(np.max(np.asarray(r_e.diagnostics["r_hat"]["mu"]))) < 1.02


@pytest.mark.slow
def test_runner_cache_pins_user_vg_fn(key):
    """_RUNNER_CACHE keys on id(value_and_grad_fn); the cache must PIN
    the callable so deleting it and allocating a new one can never alias
    onto a stale compiled runner (VERDICT r2 weak #5)."""
    import gc
    import weakref

    from brancher_tpu import NormalVariable, ProbabilisticModel
    from brancher_tpu.inference import sample

    z = NormalVariable(jnp.zeros(2, jnp.float32), jnp.ones(2, jnp.float32), "z")
    model = ProbabilisticModel([z])
    traces = []

    def make_vg(scale, tag):
        def vg(zf):
            traces.append(tag)  # runs at trace time only
            lp = -0.5 * jnp.sum((zf / scale) ** 2, axis=-1)
            return lp, -zf / scale**2
        return vg

    f_a = make_vg(1.0, "a")
    ref_a = weakref.ref(f_a)
    kw = dict(num_samples=200, num_warmup=200, num_chains=4, key=key)
    res_a = sample(model, value_and_grad_fn=f_a, **kw)
    assert "a" in traces
    del f_a
    gc.collect()
    # pinned: its id cannot be recycled while the compiled runner lives
    assert ref_a() is not None

    f_b = make_vg(3.0, "b")
    res_b = sample(model, value_and_grad_fn=f_b, **kw)
    assert "b" in traces, "stale runner served for a NEW callable"
    sd_a = float(jnp.std(res_a.samples["z"]))
    sd_b = float(jnp.std(res_b.samples["z"]))
    assert sd_b > 2.0 * sd_a, (sd_a, sd_b)


@pytest.mark.slow
def test_no_retrace_for_given_and_dense(key):
    """VERDICT r3 weak #2/#3 regression: a second sample(given=...) call
    with EQUAL-content (but freshly allocated) conditioning arrays, and
    a second sample(mass='dense') call, must compile NOTHING new — the
    content-keyed closure caches give the potentials stable identities,
    so the runner cache hits and the draws are bit-identical."""
    from brancher_tpu.inference.mcmc import _RUNNER_CACHE

    mu = NormalVariable(0.0, 5.0, "mu")
    b = NormalVariable(0.0, 1.0, "b")
    x = NormalVariable(mu + b, 0.5, "x", plate_shape=(12,))
    x.observe(np.random.RandomState(0).normal(2, 0.5, 12).astype(np.float32))
    m = ProbabilisticModel([x])
    kw = dict(kernel=NUTS(max_depth=6), num_samples=80, num_warmup=80,
              num_chains=4, key=key)

    _RUNNER_CACHE.clear()
    r1 = sample(m, given={"b": jnp.asarray(0.5, jnp.float32)}, **kw)
    n_after_first = len(_RUNNER_CACHE)
    assert n_after_first >= 1
    # fresh array object, equal content
    r2 = sample(m, given={"b": jnp.asarray(0.5, jnp.float32)}, **kw)
    assert len(_RUNNER_CACHE) == n_after_first, (
        "second sample(given=...) call compiled a new runner"
    )
    np.testing.assert_array_equal(np.asarray(r1.samples["mu"]),
                                  np.asarray(r2.samples["mu"]))
    # DIFFERENT given content must still retrace (correctness over cache)
    r3 = sample(m, given={"b": jnp.asarray(-1.5, jnp.float32)}, **kw)
    assert len(_RUNNER_CACHE) == n_after_first + 1
    assert not np.array_equal(np.asarray(r1.samples["mu"]),
                              np.asarray(r3.samples["mu"]))

    # dense-mass: stage B closures are cached on the stage-A statistics
    _RUNNER_CACHE.clear()
    d1 = sample(m, mass="dense", **kw)
    n_dense = len(_RUNNER_CACHE)
    d2 = sample(m, mass="dense", **kw)
    assert len(_RUNNER_CACHE) == n_dense, (
        "second sample(mass='dense') call compiled a new runner"
    )
    np.testing.assert_array_equal(np.asarray(d1.samples["mu"]),
                                  np.asarray(d2.samples["mu"]))
