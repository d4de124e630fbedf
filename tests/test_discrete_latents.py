"""Discrete-latent inference: BlackBox SVI end-to-end + exact enumeration
(VERDICT r1 missing #4 / next-round #6)."""
import jax
import jax.numpy as jnp
import pytest
import numpy as np

import brancher_tpu.functions as BF
from brancher_tpu import (
    BernoulliVariable,
    CategoricalVariable,
    DeterministicVariable,
    NormalVariable,
    ProbabilisticModel,
)
from brancher_tpu.inference import perform_inference, sample, NUTS
from brancher_tpu.inference.svi import ReverseKL
from brancher_tpu.inference.gradient_estimators import BlackBoxEstimator


def _posterior_b1(obs, prior=0.5, sigma=0.5):
    """Exact p(b=1 | x) for x ~ N(4b-2, sigma)."""
    from scipy.stats import norm

    l1 = norm.pdf(obs, 2.0, sigma) * prior
    l0 = norm.pdf(obs, -2.0, sigma) * (1 - prior)
    return l1 / (l1 + l0)


def test_blackbox_svi_bernoulli_latent(key):
    """A Bernoulli latent trained end-to-end through a DSL guide with the
    score-function estimator recovers the exact posterior probability."""
    b = BernoulliVariable(0.5, name="b")
    x = NormalVariable(4.0 * b - 2.0, 0.5, "x")
    obs = 1.0
    x.observe(jnp.asarray(obs))
    p_model = ProbabilisticModel([x])

    qlogit = DeterministicVariable(jnp.asarray(0.0), "qlogit", learnable=True)
    qb = BernoulliVariable(logits=qlogit, name="b")
    q_model = ProbabilisticModel([qb])

    res = perform_inference(
        p_model,
        posterior_model=q_model,
        number_iterations=1500,
        number_samples=64,
        lr=0.05,
        inference_method=ReverseKL(BlackBoxEstimator()),
        key=key,
    )
    p_hat = float(jax.nn.sigmoid(res.params["q"]["qlogit"]))
    p_true = _posterior_b1(obs)
    assert abs(p_hat - p_true) < 0.07, (p_hat, p_true)


def _mixture_model(data, k=2):
    n = data.shape[0]
    mu = NormalVariable(jnp.zeros(k), 3.0 * jnp.ones(k), "mu")
    z = CategoricalVariable(probs=jnp.ones(k) / k, name="z", plate_shape=(n,))
    x = NormalVariable(BF.take(mu, z), 0.5, "x")
    x.observe(jnp.asarray(data))
    return ProbabilisticModel([x])


def _make_mixture_data(n=40, seed=0):
    rng = np.random.RandomState(seed)
    comp = rng.randint(0, 2, n)
    mus = np.asarray([-2.0, 2.0])
    return (mus[comp] + 0.5 * rng.normal(size=n)).astype(np.float32), comp


def test_enum_factorization_check():
    data, _ = _make_mixture_data()
    comp = _mixture_model(data).compiled()
    assert comp.check_enum_factorization(comp.initial_params)


def test_enumerated_log_density_matches_bruteforce(key):
    """Exact check on a small mixture: enumeration == brute-force sum."""
    data, _ = _make_mixture_data(n=6, seed=1)
    comp = _mixture_model(data).compiled()
    params = comp.initial_params
    z = {"mu": jnp.asarray([-1.5, 1.2])}
    got = float(comp.enumerated_log_density(params, z))
    # brute force over all 2^6 assignments
    import itertools

    vals = []
    for assign in itertools.product([0, 1], repeat=6):
        d = jnp.asarray(assign, jnp.int32)
        vals.append(float(comp.log_density_z(params, z, {"z": d})))
    expect = float(jax.scipy.special.logsumexp(jnp.asarray(vals)))
    assert abs(got - expect) < 1e-3, (got, expect)


@pytest.mark.slow
def test_enumerated_nuts_mixture_assignments(key):
    """NUTS over the marginalized density recovers component means AND the
    per-point assignment posterior — without Mixture's manual
    marginalization (VERDICT r1 #6 'done' criterion)."""
    data, true_comp = _make_mixture_data(n=40, seed=0)
    model = _mixture_model(data)
    res = sample(model, kernel=NUTS(max_depth=8), num_samples=400,
                 num_warmup=400, num_chains=4, key=key,
                 enumerate_discrete=True)
    mu = np.asarray(res.samples["mu"]).reshape(-1, 2)
    # the mixture posterior is permutation-symmetric (label switching
    # across chains): order each draw before averaging
    mu_sorted = np.sort(mu, axis=1).mean(0)
    assert abs(mu_sorted[0] + 2.0) < 0.2, mu_sorted
    assert abs(mu_sorted[1] - 2.0) < 0.2, mu_sorted

    # responsibilities at the (ordered) posterior mean point
    comp = model.compiled()
    zhat = {"mu": jnp.asarray(mu_sorted)}
    _, resp = comp.enumerated_log_density(
        comp.initial_params, zhat, return_responsibilities=True)
    hard = np.asarray(jnp.argmax(resp["z"], axis=-1))
    acc = max((hard == true_comp).mean(), (1 - hard == true_comp).mean())
    assert acc > 0.95, acc


def test_enumerated_svi_mixture(key):
    """Mean-field SVI over mu with enumerated discrete latents."""
    data, _ = _make_mixture_data(n=40, seed=0)
    model = _mixture_model(data)
    res = perform_inference(
        model, number_iterations=800, number_samples=8, lr=0.05,
        inference_method=ReverseKL(enumerate_discrete=True), key=key,
    )
    zs, _ = res.guide.sample_and_log_prob(res.params["q"],
                                          jax.random.PRNGKey(1), 200)
    mu_sorted = np.sort(np.asarray(zs["mu"]), axis=1).mean(0)
    assert abs(mu_sorted[0] + 2.0) < 0.3, mu_sorted
    assert abs(mu_sorted[1] - 2.0) < 0.3, mu_sorted


# ---------------------------------------------------------------------------
# Chain-structured (interacting) discrete latents: forward-algorithm
# enumeration (ROADMAP r2 #7).  A DSL HMM: s_t | s_{t-1} ~ Cat(A[s_{t-1}]),
# x_t ~ N(mu + 2*(2 s_t - 1), 0.6) with mu a continuous latent.
# ---------------------------------------------------------------------------
_A = np.asarray([[0.9, 0.1], [0.2, 0.8]], np.float32)


def _chain_hmm_model(data):
    t_n = data.shape[0]
    a = jnp.asarray(_A)
    mu = NormalVariable(0.0, 3.0, "mu")
    s = CategoricalVariable(probs=jnp.asarray([0.5, 0.5]), name="s0")
    states = [s]
    for t in range(1, t_n):
        s = CategoricalVariable(probs=BF.take(a, s, axis=0), name=f"s{t}")
        states.append(s)
    outs = []
    for t, st in enumerate(states):
        x = NormalVariable(2.0 * (2.0 * st - 1.0) + mu, 0.6, f"x{t}")
        x.observe(jnp.asarray(data[t]))
        outs.append(x)
    return ProbabilisticModel(outs)


def _make_chain_data(t_n=12, mu=0.5, seed=3):
    rng = np.random.RandomState(seed)
    s = rng.randint(0, 2)
    xs, ss = [], []
    for _ in range(t_n):
        ss.append(s)
        xs.append(mu + 2.0 * (2 * s - 1) + 0.6 * rng.normal())
        s = rng.choice(2, p=_A[s])
    return np.asarray(xs, np.float32), np.asarray(ss)


def test_chain_factorization_detects_hmm():
    data, _ = _make_chain_data(t_n=6)
    comp = _chain_hmm_model(data).compiled()
    p = comp.initial_params
    assert not comp.check_enum_factorization(p)  # states interact
    assert comp.check_chain_factorization(p)


def test_chain_enumerated_matches_bruteforce():
    import itertools

    data, _ = _make_chain_data(t_n=6)
    comp = _chain_hmm_model(data).compiled()
    p = comp.initial_params
    z = {"mu": jnp.asarray(1.3)}
    got, marg = comp.chain_enumerated_log_density(p, z, return_marginals=True)
    vals = {}
    for assign in itertools.product([0, 1], repeat=6):
        g = {f"s{t}": jnp.asarray(a, jnp.int32) for t, a in enumerate(assign)}
        vals[assign] = float(comp.log_density_z(p, z, g))
    lv = jnp.asarray(list(vals.values()))
    expect = float(jax.scipy.special.logsumexp(lv))
    assert abs(float(got) - expect) < 1e-3, (float(got), expect)
    # smoothing marginals vs brute-force posterior marginals
    w = np.exp(np.asarray(lv) - expect)
    for t in range(6):
        p1 = sum(wi for wi, a in zip(w, vals.keys()) if a[t] == 1)
        assert abs(float(marg[f"s{t}"][1]) - p1) < 1e-3, (t, p1)


def test_long_unrolled_chain_warns_and_steers_to_markov_series():
    """VERDICT r4 missing #4: an unrolled T-node DSL chain traces O(T)
    through the per-node table builders; past the threshold the dispatch
    must emit ONE actionable warning naming MarkovSeries (the O(1)-in-T
    sequence-node alternative) — and small chains must stay silent."""
    import warnings

    t_n = 80  # > CompiledModel._UNROLLED_ENUM_WARN_AT (64)
    data, _ = _make_chain_data(t_n=t_n)
    comp = _chain_hmm_model(data).compiled()
    with pytest.warns(UserWarning, match="MarkovSeries"):
        comp.enum_log_density_fn(comp.initial_params)

    small, _ = _make_chain_data(t_n=6)
    comp_small = _chain_hmm_model(small).compiled()
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        comp_small.enum_log_density_fn(comp_small.initial_params)


def _chain_posterior_quadrature(comp):
    """Exact posterior mean/sd of the scalar mu by quadrature over the
    chain-marginalized density (mu's unconstrained transform = identity)."""
    p = comp.initial_params
    grid = jnp.linspace(-3.0, 4.0, 2001)
    lps = jax.vmap(
        lambda g: comp.chain_enumerated_log_density(p, {"mu": g})
    )(grid)
    w = jnp.exp(lps - jax.scipy.special.logsumexp(lps))
    mean = float(jnp.sum(w * grid))
    sd = float(jnp.sqrt(jnp.sum(w * grid ** 2) - mean ** 2))
    return mean, sd


@pytest.mark.slow
def test_enumerated_nuts_chain_hmm(key):
    """NUTS over the forward-algorithm-marginalized density matches the
    quadrature-exact posterior of a DSL HMM (interacting discrete latents
    — the element-wise enumeration path must reject this model)."""
    data, _ = _make_chain_data(t_n=12, mu=0.5, seed=3)
    model = _chain_hmm_model(data)
    exact_mean, exact_sd = _chain_posterior_quadrature(model.compiled())
    res = sample(model, kernel=NUTS(max_depth=6), num_samples=200,
                 num_warmup=200, num_chains=2, key=key,
                 enumerate_discrete=True)
    mu = np.asarray(res.samples["mu"])
    assert abs(mu.mean() - exact_mean) < 0.4 * exact_sd, (mu.mean(), exact_mean)
    assert abs(mu.std() - exact_sd) < 0.4 * exact_sd, (mu.std(), exact_sd)


def test_chain_enumerated_svi(key):
    """Mean-field SVI with chain enumeration lands near the exact
    posterior of the DSL HMM's emission offset."""
    data, _ = _make_chain_data(t_n=12, mu=0.5, seed=3)
    model = _chain_hmm_model(data)
    exact_mean, exact_sd = _chain_posterior_quadrature(model.compiled())
    res = perform_inference(
        model, number_iterations=800, number_samples=8, lr=0.05,
        inference_method=ReverseKL(enumerate_discrete=True), key=key,
    )
    zs, _ = res.guide.sample_and_log_prob(res.params["q"],
                                          jax.random.PRNGKey(1), 400)
    mu_hat = float(np.asarray(zs["mu"]).mean())
    assert abs(mu_hat - exact_mean) < 0.8 * exact_sd, (mu_hat, exact_mean)


# ---------------------------------------------------------------------------
# Round-3 structural enumeration (VERDICT r2 #4): general variable
# elimination over graph-walk-extracted local factors, cached dispatch.
# ---------------------------------------------------------------------------

def _three_way_model(data=1.2):
    """Collider with a 3-way interaction: y depends on d1*d2*d3 — neither
    element-wise nor pairwise-chain representable."""
    d1 = BernoulliVariable(0.4, name="d1")
    d2 = BernoulliVariable(0.5, name="d2")
    d3 = BernoulliVariable(0.6, name="d3")
    mu = NormalVariable(0.0, 2.0, "mu")
    y = NormalVariable(mu + d1 + 0.5 * d2 - d3 + 2.0 * d1 * d2 * d3, 0.7, "y")
    y.observe(jnp.asarray(data, jnp.float32))
    return ProbabilisticModel([y])


@pytest.mark.slow
def test_factor_enumeration_matches_bruteforce():
    import itertools

    comp = _three_way_model().compiled()
    p = comp.initial_params
    # not a chain (3-way term), not element-wise
    assert not comp.check_enum_factorization(p)
    assert comp.discrete_chain_structure() is None
    z = {"mu": jnp.asarray(0.8)}
    got = float(comp.factor_enumerated_log_density(p, z))
    lps = [
        float(comp.log_density_z(p, z, {
            "d1": jnp.asarray(a, jnp.int32),
            "d2": jnp.asarray(b, jnp.int32),
            "d3": jnp.asarray(c, jnp.int32),
        }))
        for a, b, c in itertools.product([0, 1], repeat=3)
    ]
    expect = float(jax.scipy.special.logsumexp(jnp.asarray(lps)))
    assert abs(got - expect) < 1e-4, (got, expect)
    # gradient flows through the elimination (it sits under NUTS)
    g = jax.grad(lambda m: comp.factor_enumerated_log_density(p, {"mu": m}))(
        jnp.asarray(0.8)
    )
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_factor_enumeration_nonadjacent_pair():
    """d1–d3 interaction skipping d2: fails the chain check (non-adjacent
    factor) but enumerates exactly via variable elimination — the VERDICT
    r2 #4 'done' criterion."""
    import itertools

    d1 = BernoulliVariable(0.3, name="d1")
    d2 = BernoulliVariable(0.5, name="d2")
    d3 = BernoulliVariable(0.7, name="d3")
    mu = NormalVariable(0.0, 2.0, "mu")
    y = NormalVariable(mu + d1 + d2 + 1.5 * d1 * d3, 0.6, "y")
    y.observe(jnp.asarray(0.9, jnp.float32))
    comp = ProbabilisticModel([y]).compiled()
    p = comp.initial_params
    assert not comp.check_chain_factorization(p)
    fn = comp.enum_log_density_fn(p)
    assert fn == comp.factor_enumerated_log_density
    z = {"mu": jnp.asarray(-0.2)}
    got = float(fn(p, z))
    lps = [
        float(comp.log_density_z(p, z, {
            "d1": jnp.asarray(a, jnp.int32),
            "d2": jnp.asarray(b, jnp.int32),
            "d3": jnp.asarray(c, jnp.int32),
        }))
        for a, b, c in itertools.product([0, 1], repeat=3)
    ]
    expect = float(jax.scipy.special.logsumexp(jnp.asarray(lps)))
    assert abs(got - expect) < 1e-4, (got, expect)


@pytest.mark.slow
def test_factor_enumerated_nuts(key):
    """NUTS over the elimination-marginalized density matches quadrature
    on the collider model's continuous latent."""
    model = _three_way_model()
    comp = model.compiled()
    p = comp.initial_params
    grid = jnp.linspace(-4.0, 5.0, 1501)
    lps = jax.vmap(
        lambda g: comp.factor_enumerated_log_density(p, {"mu": g})
    )(grid)
    w = jnp.exp(lps - jax.scipy.special.logsumexp(lps))
    exact_mean = float(jnp.sum(w * grid))
    exact_sd = float(jnp.sqrt(jnp.sum(w * grid**2) - exact_mean**2))

    res = sample(model, kernel=NUTS(max_depth=6), num_samples=400,
                 num_warmup=300, num_chains=2, key=key,
                 enumerate_discrete=True)
    mu = np.asarray(res.samples["mu"])
    assert abs(mu.mean() - exact_mean) < 0.35 * exact_sd, (mu.mean(), exact_mean)
    assert abs(mu.std() - exact_sd) < 0.4 * exact_sd, (mu.std(), exact_sd)


@pytest.mark.slow
def test_enum_dispatch_cached_no_reprobe(key):
    """Second sample() must hit the cached enumerated potential without
    re-running the factorization probes (VERDICT r2 weak #6)."""
    data, _ = _make_chain_data(t_n=6)
    model = _chain_hmm_model(data)
    comp = model.compiled()
    kw = dict(kernel=NUTS(max_depth=5), num_samples=20, num_warmup=20,
              num_chains=2, enumerate_discrete=True)
    r1 = sample(model, key=key, **kw)
    assert hasattr(comp, "_enum_potential_cache")

    def boom(*a, **k):
        raise AssertionError("re-probed on second sample()")

    orig = (comp.check_enum_factorization, comp.enum_log_density_fn)
    comp.check_enum_factorization = boom
    comp.enum_log_density_fn = boom
    try:
        r2 = sample(model, key=key, **kw)
    finally:
        comp.check_enum_factorization, comp.enum_log_density_fn = orig
    np.testing.assert_allclose(
        np.asarray(r1.samples["mu"]), np.asarray(r2.samples["mu"])
    )


@pytest.mark.slow
def test_structural_chain_tables_match_probe():
    """The graph-walk factor extractor reproduces the probe-based chain
    tables' density exactly (same forward-algorithm total)."""
    data, _ = _make_chain_data(t_n=8)
    comp = _chain_hmm_model(data).compiled()
    p = comp.initial_params
    names = comp.discrete_chain_structure()
    assert names == [f"s{t}" for t in range(8)]
    z = {"mu": jnp.asarray(0.4)}
    b_s, u_s, psi_s = comp._chain_tables_structural(p, z, {}, names, 2)
    b_p, u_p, psi_p = comp._chain_tables(p, z, {}, names, 2)
    # decompositions differ by per-table constants; totals must agree
    lse = jax.scipy.special.logsumexp

    def fwd(b, u, psi):
        alpha = u[0]
        for t in range(1, len(names)):
            alpha = lse(alpha[:, None] + psi[t - 1], axis=0) + u[t]
        return float(b + lse(alpha))

    assert abs(fwd(b_s, u_s, psi_s) - fwd(b_p, u_p, psi_p)) < 1e-3


def _plated_pair_model(e=3):
    """Two plated Bernoullis with an ELEMENT-wise interaction (z2's
    logits follow z1 per element) plus a continuous latent — the
    ROADMAP r3 #7 shape that previously raised."""
    mu = NormalVariable(0.0, 2.0, "mu")
    z1 = BernoulliVariable(0.4, name="z1", plate_shape=(e,))
    z2 = BernoulliVariable(logits=1.5 * z1 - 0.5, name="z2")
    y = NormalVariable(mu + z1 + 0.5 * z2 + 1.2 * z1 * z2, 0.7, "y")
    y.observe(jnp.asarray(np.linspace(-0.5, 1.5, e), jnp.float32))
    return ProbabilisticModel([y])


@pytest.mark.slow
def test_group_enumeration_matches_bruteforce():
    import itertools

    e = 3
    comp = _plated_pair_model(e).compiled()
    p = comp.initial_params
    # interacting AND plated: every earlier path declines...
    assert not comp.check_enum_factorization(p)
    assert comp.discrete_chain_info(p) is None  # plated => no scalar chain
    # ...and the dispatcher lands on per-element group enumeration
    fn = comp.enum_log_density_fn(p)
    assert fn == comp.group_enumerated_log_density
    assert comp._enum_groups() == (("z1", "z2"),)

    z = {"mu": jnp.asarray(0.6)}
    got = float(fn(p, z))
    lps = []
    for d1 in itertools.product([0, 1], repeat=e):
        for d2 in itertools.product([0, 1], repeat=e):
            lps.append(float(comp.log_density_z(p, z, {
                "z1": jnp.asarray(d1, jnp.int32),
                "z2": jnp.asarray(d2, jnp.int32),
            })))
    expect = float(jax.scipy.special.logsumexp(jnp.asarray(lps)))
    assert abs(got - expect) < 1e-4, (got, expect)

    # gradient flows (the density sits under NUTS/SVI)
    g = jax.grad(lambda m: comp.group_enumerated_log_density(p, {"mu": m}))(
        jnp.asarray(0.6)
    )
    assert np.isfinite(float(g)) and abs(float(g)) > 0

    # per-element posterior marginals: [E, K], rows sum to 1
    _tot, resp = comp.group_enumerated_log_density(
        p, z, return_responsibilities=True
    )
    assert set(resp) == {"z1", "z2"}
    for n in ("z1", "z2"):
        assert resp[n].shape == (e, 2)
        np.testing.assert_allclose(np.asarray(resp[n]).sum(-1), 1.0, atol=1e-5)


def test_group_enumeration_rejects_cross_element_coupling():
    """A term coupling DIFFERENT plate elements (product over the plate)
    is not enumerable by any path — the dispatcher must raise its clean
    ValueError instead of returning a wrong marginal."""
    import pytest

    z1 = BernoulliVariable(0.5, name="z1", plate_shape=(3,))
    y = NormalVariable(2.0 * BF.prod(z1), 0.5, "y")
    # NOT 1.0: that sits midway between the two reachable means (0 and
    # 2), making the additivity defect cancel exactly at every probe
    y.observe(jnp.asarray(1.5, jnp.float32))
    comp = ProbabilisticModel([y]).compiled()
    p = comp.initial_params
    assert not comp.check_group_factorization(p)
    with pytest.raises(ValueError, match="cross-element"):
        comp.enum_log_density_fn(p)


@pytest.mark.slow
def test_group_enumerated_nuts(key):
    """NUTS over mu with the plated interacting pair summed out lands on
    the quadrature-exact posterior (brute-force discrete sum per mu)."""
    e = 2
    model = _plated_pair_model(e)
    comp = model.compiled()
    p = comp.initial_params

    # quadrature ground truth over mu with the 2^e x 2^e discrete sum
    import itertools

    grid = np.linspace(-3.0, 3.0, 241)
    lps = []
    for m in grid:
        z = {"mu": jnp.asarray(float(m), jnp.float32)}
        vals = [float(comp.log_density_z(p, z, {
            "z1": jnp.asarray(d1, jnp.int32),
            "z2": jnp.asarray(d2, jnp.int32),
        })) for d1 in itertools.product([0, 1], repeat=e)
            for d2 in itertools.product([0, 1], repeat=e)]
        lps.append(float(jax.scipy.special.logsumexp(jnp.asarray(vals))))
    w = np.exp(np.asarray(lps) - max(lps))
    w /= w.sum()
    mu_mean = float((w * grid).sum())
    mu_sd = float(np.sqrt((w * (grid - mu_mean) ** 2).sum()))

    res = sample(model, kernel=NUTS(), num_samples=400, num_warmup=300,
                 num_chains=4, key=key, enumerate_discrete=True)
    draws = np.asarray(res.samples["mu"]).ravel()
    assert abs(draws.mean() - mu_mean) < 3.5 * mu_sd / np.sqrt(40), (
        draws.mean(), mu_mean, mu_sd)
    assert 0.6 * mu_sd < draws.std() < 1.5 * mu_sd, (draws.std(), mu_sd)


# -- sequence-node enumeration (VERDICT r3 missing #3 / ROADMAP #6) -----

def _markov_hmm_model(t_len, k=3, seed=0, emission_scale=0.7):
    """DSL HMM as ONE plated MarkovProcess node: the scalable idiom —
    trace time independent of T by construction."""
    from brancher_tpu.distributions import Categorical
    from brancher_tpu.stochastic_processes import MarkovProcess
    import brancher_tpu.functions as BF

    trans_logits = jnp.asarray(
        np.random.RandomState(0).normal(0, 1.5, (k, k)).astype(np.float32)
    )
    pi0 = jnp.zeros((k,), jnp.float32)
    s = MarkovProcess(
        t_len, Categorical(), lambda prev: {"logits": trans_logits[prev]},
        init_dist=Categorical(), init_links={"logits": pi0}, name="s",
    )
    locs = NormalVariable(jnp.zeros(k), 2.0 * jnp.ones(k), "locs")
    y = NormalVariable(BF.take(locs, s), emission_scale, "y")
    y.observe(np.random.RandomState(seed).normal(0, 2, t_len).astype(np.float32))
    return ProbabilisticModel([y]), trans_logits, pi0


def test_sequence_enum_matches_hand_forward(key):
    """sequence_enumerated_log_density == hand-rolled forward algorithm
    + continuous prior, exactly."""
    t_len, k = 12, 3
    m, trans_logits, pi0 = _markov_hmm_model(t_len, k)
    comp = m.compiled()
    params = comp.initial_params
    assert comp._sequence_chain_info(params) == [("s", t_len, k)]
    assert comp.check_sequence_factorization(params)
    fn = comp.enum_log_density_fn(params, None)
    assert fn == comp.sequence_enumerated_log_density

    data = np.asarray(
        next(v for v in comp.order if v.name == "y")._observed
    )
    z = {"locs": jnp.asarray(
        np.random.RandomState(2).normal(0, 1, k).astype(np.float32)
    )}
    total = float(comp.sequence_enumerated_log_density(params, z))

    locs_c = np.asarray(z["locs"])
    log_trans = np.asarray(jax.nn.log_softmax(trans_logits, axis=-1))
    alpha = np.asarray(jax.nn.log_softmax(pi0)) + _norm_lp(data[0], locs_c, 0.7)
    for t in range(1, t_len):
        alpha = (
            np.asarray(jax.scipy.special.logsumexp(
                jnp.asarray(alpha)[:, None] + jnp.asarray(log_trans), axis=0
            ))
            + _norm_lp(data[t], locs_c, 0.7)
        )
    marg = float(jax.scipy.special.logsumexp(jnp.asarray(alpha)))
    prior = float(np.sum(_norm_lp(locs_c, 0.0, 2.0)))
    np.testing.assert_allclose(total, marg + prior, rtol=1e-5)

    # forward-backward marginals normalize and are exact vs brute force
    # at tiny T
    _tot, post = comp.sequence_enumerated_log_density(
        params, z, return_marginals=True
    )
    assert post["s"].shape == (t_len, k)
    np.testing.assert_allclose(np.asarray(post["s"]).sum(1), 1.0, atol=1e-5)


def _norm_lp(x, loc, scale):
    return (
        -0.5 * ((np.asarray(x) - loc) / scale) ** 2
        - np.log(scale) - 0.5 * np.log(2 * np.pi)
    )


@pytest.mark.slow
def test_sequence_enum_trace_time_independent_of_t():
    """The done-criterion of VERDICT r3 #3: compile+trace time of the
    enumerated density is independent of T (T=10^4 within 3x of
    T=10^2; the unrolled idiom would be ~100x)."""
    import time

    times = {}
    for t_len in (100, 10_000):
        m, _tl, _p = _markov_hmm_model(t_len)
        comp = m.compiled()
        params = comp.initial_params
        fn = comp.enum_log_density_fn(params, None)
        z = {"locs": jnp.zeros(3)}
        t0 = time.time()
        f = jax.jit(lambda zz: fn(params, zz, None))
        jax.block_until_ready(f(z))
        times[t_len] = time.time() - t0
    assert times[10_000] < 3.0 * times[100] + 1.0, times


@pytest.mark.slow
def test_sequence_enum_nuts_recovers_emissions(key):
    """NUTS with enumerate_discrete on a T=500 Markov-chain HMM recovers
    the emission locations (up to state relabeling)."""
    from brancher_tpu.distributions import Categorical
    from brancher_tpu.stochastic_processes import MarkovProcess
    import brancher_tpu.functions as BF

    t_len, k = 500, 2
    rng = np.random.RandomState(3)
    # sticky ground-truth chain, well-separated emissions
    lt = jnp.asarray([[2.0, -2.0], [-2.0, 2.0]], jnp.float32)
    states = [0]
    for _ in range(t_len - 1):
        p = np.asarray(jax.nn.softmax(lt[states[-1]]))
        states.append(rng.choice(k, p=p))
    states = np.asarray(states)
    true_locs = np.asarray([-1.5, 1.5], np.float32)
    data = (true_locs[states] + 0.5 * rng.normal(size=t_len)).astype(np.float32)

    s = MarkovProcess(
        t_len, Categorical(), lambda prev: {"logits": lt[prev]},
        init_dist=Categorical(),
        init_links={"logits": jnp.zeros(k, jnp.float32)}, name="s",
    )
    locs = NormalVariable(jnp.zeros(k), 2.0 * jnp.ones(k), "locs")
    y = NormalVariable(BF.take(locs, s), 0.5, "y")
    y.observe(data)
    m = ProbabilisticModel([y])

    res = sample(m, num_samples=200, num_warmup=200, num_chains=4,
                 key=key, enumerate_discrete=True)
    # the two emission labels are exchangeable: chains settle in either
    # of the two permuted modes, so sort WITHIN each chain before
    # averaging (pooled means would cancel toward 0)
    per_chain = np.sort(np.asarray(res.samples["locs"]).mean(axis=1), axis=-1)
    got = per_chain.mean(axis=0)
    np.testing.assert_allclose(got, np.sort(true_locs), atol=0.25)


def test_sequence_enum_refuses_cross_timestep_coupling():
    """An emission coupling different timesteps (cumsum over the chain)
    must fail the factorization check, not return a wrong marginal."""
    from brancher_tpu.distributions import Categorical
    from brancher_tpu.stochastic_processes import MarkovProcess
    import brancher_tpu.functions as BF

    t_len, k = 8, 2
    lt = jnp.zeros((k, k), jnp.float32)
    s = MarkovProcess(
        t_len, Categorical(), lambda prev: {"logits": lt[prev]},
        init_dist=Categorical(),
        init_links={"logits": jnp.zeros(k, jnp.float32)}, name="s",
    )
    drift = NormalVariable(0.0, 1.0, "drift")
    # cumulative sum couples every timestep to all earlier states
    y = NormalVariable(BF.cumsum(s) * 1.0 + drift, 0.5, "y")
    y.observe(np.zeros(t_len, np.float32))
    m = ProbabilisticModel([y])
    comp = m.compiled()
    params = comp.initial_params
    assert not comp.check_sequence_factorization(params)
    with pytest.raises(ValueError):
        comp.enum_log_density_fn(params, None)


def test_group_enumeration_uses_structural_tables(monkeypatch):
    """VERDICT r3 missing #4 done-criterion: evaluating the group-
    enumerated density on the plated-pair model performs NO full-density
    probe (``log_density_z``) beyond the single base walk — the tables
    come from structural local-term evaluations."""
    e = 3
    comp = _plated_pair_model(e).compiled()
    p = comp.initial_params
    fn = comp.enum_log_density_fn(p)
    assert fn == comp.group_enumerated_log_density

    calls = {"n": 0}
    orig = type(comp).log_density_z

    def counting(self, *a, **k):
        calls["n"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(type(comp), "log_density_z", counting)
    z = {"mu": jnp.asarray(0.6)}
    val = float(comp.group_enumerated_log_density(p, z))
    assert np.isfinite(val)
    assert calls["n"] == 0, (
        f"group enumeration made {calls['n']} full-density walks; the "
        "structural table path must make none"
    )

    # the probe fallback (forced) agrees exactly with the structural path
    monkeypatch.undo()

    def raising(*a, **k):
        raise ValueError("force probe fallback")

    monkeypatch.setattr(type(comp), "_group_tables_structural", raising)
    val_probe = float(comp.group_enumerated_log_density(p, z))
    np.testing.assert_allclose(val, val_probe, rtol=1e-5)


def test_group_enumeration_mixed_scalar_and_plated():
    """Mixed plate shapes (VERDICT r3 missing #4): a SCALAR regime
    latent interacting with a plated Bernoulli enumerates exactly
    (vs brute force over all joint assignments)."""
    import itertools

    e, k_r = 3, 3
    r = CategoricalVariable(logits=jnp.zeros(k_r), name="r")  # scalar
    z1 = BernoulliVariable(logits=0.8 * r - 1.0, name="z1", plate_shape=(e,))
    mu = NormalVariable(0.0, 2.0, "mu")
    y = NormalVariable(mu + z1 * (0.5 + 1.0 * r), 0.7, "y")
    y.observe(jnp.asarray(np.linspace(-0.5, 1.5, e), jnp.float32))
    m = ProbabilisticModel([y])
    comp = m.compiled()
    p = comp.initial_params
    assert comp._enum_groups() == (("r", "z1"),)
    assert comp.check_group_factorization(p)
    fn = comp.enum_log_density_fn(p)
    assert fn == comp.group_enumerated_log_density

    z = {"mu": jnp.asarray(0.4)}
    got = float(fn(p, z))
    lps = []
    for rv in range(k_r):
        for d1 in itertools.product([0, 1], repeat=e):
            lps.append(float(comp.log_density_z(p, z, {
                "r": jnp.asarray(rv, jnp.int32),
                "z1": jnp.asarray(d1, jnp.int32),
            })))
    expect = float(jax.scipy.special.logsumexp(jnp.asarray(lps)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)

    # responsibilities: scalar latent gets a [K] marginal, plated [E, K]
    _tot, resp = comp.group_enumerated_log_density(
        p, z, return_responsibilities=True
    )
    assert resp["r"].shape == (k_r,)
    assert resp["z1"].shape == (e, 2)
    np.testing.assert_allclose(float(np.sum(np.asarray(resp["r"]))), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(resp["z1"]).sum(-1), 1.0,
                               atol=1e-5)
    # brute-force marginal for r as the oracle
    w = np.exp(np.asarray(lps) - expect).reshape(k_r, 2 ** e)
    np.testing.assert_allclose(np.asarray(resp["r"]), w.sum(1), atol=1e-5)

    # gradient flows through the mixed path
    g = jax.grad(lambda mm: fn(p, {"mu": mm}))(jnp.asarray(0.4))
    assert np.isfinite(float(g))


def test_group_structural_tables_include_support_jacobian():
    """Round-4 review regression: the STRUCTURAL per-element group
    tables (_term_vec_fn) must include the support-transform
    log-Jacobian for interval latents whose bounds depend on the
    enumerated discrete latent — the scalar _term_table always did, and
    dropping it shifted the marginal by ~0.17 nats on this model."""
    import itertools

    from brancher_tpu import UniformVariable

    z1 = BernoulliVariable(probs=0.3, name="z1", plate_shape=(2,))
    z2 = BernoulliVariable(logits=1.5 * z1 - 0.5, name="z2")
    u = UniformVariable(0.0, 1.0 + z1, "u")  # bounds depend on z1
    y = NormalVariable(u + z2, 0.7, "y", observed=jnp.asarray([1.2, -0.3]))
    comp = ProbabilisticModel([y]).compiled()
    p = comp.initial_params
    store = comp._as_store(p)
    z = {"u": jnp.asarray([0.3, -0.4])}

    assert comp.check_group_factorization(p)
    got = float(comp.group_enumerated_log_density(p, z))
    tot = None
    for a1 in itertools.product([0, 1], [0, 1]):
        for a2 in itertools.product([0, 1], [0, 1]):
            lp = comp._walk_z(store, z, {
                "z1": jnp.asarray(a1, jnp.int32),
                "z2": jnp.asarray(a2, jnp.int32),
            })[1]
            tot = lp if tot is None else jnp.logaddexp(tot, lp)
    np.testing.assert_allclose(got, float(tot), rtol=1e-5)
