"""Time-series / stochastic-process variables, compiled with lax.scan.

Reference parity: Brancher builds time-series models (AR, state-space) by
Python loops creating one variable per timestep (SURVEY.md §5
"Long-context": "sequences are built by Python loops over scalar states").
That idiom unrolls — catastrophic under XLA tracing for large T.

TPU-first replacement (BASELINE.json: "sequential samplers → lax.scan
kernels"; SURVEY.md §7.6): a whole series is ONE RandomVariable whose
distribution kernels internally ``lax.scan`` (sampling) and VECTORIZE over
time (log-prob: the transition density factorizes, so all T terms
evaluate in parallel on the VPU after a shift — no sequential dependence
in the hot NUTS path).  T=1e5+ compiles O(1).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from .distributions import Distribution, Normal, REAL
from .variables import RandomVariable

Array = jax.Array


class MarkovSeries(Distribution):
    """Generic first-order Markov chain of length T.

    init_dist/init param names are bound from links prefixed ``init_``;
    transition params come from ``transition_fn(prev, **link_params)``.
    Value shape: (T,) + state_shape.
    """

    reparameterized = True
    support = REAL

    def __init__(
        self,
        length: int,
        transition_dist: Distribution,
        transition_fn: Callable[..., Dict[str, Array]],
        init_dist: Optional[Distribution] = None,
    ):
        self.length = int(length)
        self.transition_dist = transition_dist
        self.transition_fn = transition_fn
        self.init_dist = init_dist or transition_dist
        self.is_discrete = transition_dist.is_discrete
        self.support = transition_dist.support

    def _split_params(self, params):
        init_p = {k[len("init_"):]: v for k, v in params.items() if k.startswith("init_")}
        trans_p = {k: v for k, v in params.items() if not k.startswith("init_")}
        return init_p, trans_p

    def sample(self, key, **params):
        init_p, trans_p = self._split_params(params)
        k0, ks = jax.random.split(key)
        x0 = self.init_dist.sample(k0, **init_p)

        def step(carry, k):
            prev = carry
            p = self.transition_fn(prev, **trans_p)
            x = self.transition_dist.sample(k, **p)
            return x, x

        keys = jax.random.split(ks, self.length - 1)
        _, xs = jax.lax.scan(step, x0, keys)
        return jnp.concatenate([x0[None], xs], axis=0)

    def log_prob(self, value, **params):
        init_p, trans_p = self._split_params(params)
        lp0 = self.init_dist.log_prob(value[0], **init_p)
        # vectorize the transition density over time: params of x[t] depend
        # only on x[t-1]; evaluate for all t at once (VPU, no scan).
        prev = value[:-1]
        cur = value[1:]
        p = self.transition_fn(prev, **trans_p)
        lps = self.transition_dist.log_prob(cur, **p)
        lp0 = jnp.broadcast_to(lp0, lps.shape[1:])
        return jnp.concatenate([lp0[None], lps], axis=0)


class AutoRegressive(Distribution):
    """AR(p) Gaussian series: x_t = sum_i c_i x_{t-i} + b + sigma eps_t.

    Covers the reference's AR(1)/ARMA example family (SURVEY.md §2
    "Examples") and BASELINE config #3.  Coefficients/noise come in as
    links, so priors over them (NUTS targets) work naturally.
    """

    param_names = ("coefficients", "noise_scale", "bias", "init_loc", "init_scale")
    reparameterized = True
    support = REAL

    def __init__(self, length: int, order: int = 1):
        self.length = int(length)
        self.order = int(order)

    def _coeffs(self, coefficients):
        c = jnp.atleast_1d(jnp.asarray(coefficients))
        return c

    def sample(self, key, *, coefficients, noise_scale, bias=0.0, init_loc=0.0, init_scale=1.0):
        c = self._coeffs(coefficients)
        p = self.order
        k0, ks = jax.random.split(key)
        x0 = init_loc + init_scale * jax.random.normal(k0, (p,))

        def step(carry, k):
            window = carry  # [p], newest last
            mean = jnp.dot(window[::-1], c) + bias
            x = mean + noise_scale * jax.random.normal(k, ())
            window = jnp.concatenate([window[1:], x[None]])
            return window, x

        keys = jax.random.split(ks, self.length - p)
        _, xs = jax.lax.scan(step, x0, keys)
        return jnp.concatenate([x0, xs])

    def log_prob(self, value, *, coefficients, noise_scale, bias=0.0, init_loc=0.0, init_scale=1.0):
        c = self._coeffs(coefficients)
        p = self.order
        init_lp = Normal().log_prob(value[:p], loc=init_loc, scale=init_scale)
        # mean_t = sum_i c_i x_{t-i}: build lagged views (static shifts) and
        # contract — fully parallel over time.
        t = value.shape[0]
        lags = jnp.stack([value[p - 1 - i : t - 1 - i] for i in range(p)], axis=-1)  # [T-p, p]
        means = lags @ c + bias
        lp = Normal().log_prob(value[p:], loc=means, scale=noise_scale)
        return jnp.concatenate([init_lp, lp])


def ARProcess(
    length: int,
    coefficients,
    noise_scale,
    name: Optional[str] = None,
    order: Optional[int] = None,
    bias=0.0,
    init_loc=0.0,
    init_scale=1.0,
    log_prob_scale: float = 1.0,
):
    """AR(p) series variable (order inferred from coefficients if static)."""
    if order is None:
        try:
            order = len(coefficients)
        except TypeError:
            order = 1
    return RandomVariable(
        AutoRegressive(length, order),
        name=name,
        links={
            "coefficients": coefficients,
            "noise_scale": noise_scale,
            "bias": bias,
            "init_loc": init_loc,
            "init_scale": init_scale,
        },
        log_prob_scale=log_prob_scale,
    )


def MarkovProcess(
    length: int,
    transition_dist: Distribution,
    transition_fn: Callable[..., Dict[str, Array]],
    name: Optional[str] = None,
    init_dist: Optional[Distribution] = None,
    links: Optional[Dict] = None,
    init_links: Optional[Dict] = None,
):
    """Generic Markov-series variable.

    Example (linear-Gaussian latent chain)::

        x = MarkovProcess(
            T, Normal(), lambda prev, a: {"loc": a * prev, "scale": 0.5},
            links={"a": a_var}, init_links={"loc": 0.0, "scale": 1.0},
            init_dist=Normal(), name="x",
        )
    """
    all_links = dict(links or {})
    for k, v in (init_links or {}).items():
        all_links[f"init_{k}"] = v
    return RandomVariable(
        MarkovSeries(length, transition_dist, transition_fn, init_dist),
        name=name,
        links=all_links,
    )


# ---------------------------------------------------------------------------
# Gaussian-process helpers (SURVEY.md §2 notes possible GP-style helpers in
# the reference [L]; provided here as first-class sugar over the MVN kernel)
# ---------------------------------------------------------------------------
def rbf_kernel(x, lengthscale, variance):
    """RBF/squared-exponential Gram matrix for inputs x [N] or [N, D]."""
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    d2 = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1)
    return variance * jnp.exp(-0.5 * d2 / lengthscale**2)


def matern32_kernel(x, lengthscale, variance):
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    d = jnp.sqrt(jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1) + 1e-12)
    s = jnp.sqrt(3.0) * d / lengthscale
    return variance * (1.0 + s) * jnp.exp(-s)


_KERNELS = {"rbf": rbf_kernel, "matern32": matern32_kernel}


def GaussianProcess(
    inputs,
    lengthscale,
    variance,
    name: Optional[str] = None,
    kernel: str = "rbf",
    mean=0.0,
    jitter: float = 1e-5,
):
    """GP prior over function values at fixed inputs: f ~ N(mean, K).

    ``lengthscale`` / ``variance`` accept scalars, variables or
    expressions (hyperpriors compose naturally; NUTS then samples them
    jointly with f).  The Gram matrix builds inside the compiled closure —
    one fused [N,N] kernel construction + Cholesky per evaluation.
    """
    from .distributions import MultivariateNormal
    from .variables import var2link

    kfn = _KERNELS[kernel]
    x = jnp.asarray(inputs, jnp.float32)
    n = x.shape[0]
    ls_link = var2link(lengthscale)
    var_link = var2link(variance)
    mean_link = var2link(mean)

    def cov_fn(values, params):
        k = kfn(x, ls_link.fn(values, params), var_link.fn(values, params))
        return k + jitter * jnp.eye(n, dtype=k.dtype)

    def loc_fn(values, params):
        return jnp.broadcast_to(mean_link.fn(values, params), (n,))

    from .variables import PartialLink

    cov = PartialLink(tuple(ls_link.vars) + tuple(var_link.vars), cov_fn)
    loc = PartialLink(tuple(mean_link.vars), loc_fn)
    return RandomVariable(
        MultivariateNormal(), name=name,
        links={"loc": loc, "covariance_matrix": cov},
    )


def observe_timeseries(series_var, data) -> None:
    """Observe a time-series variable with MISSING entries (NaN gaps).

    Reference parity: the ``Timeseries`` observed-series sugar (Brancher's
    time-series examples condition on partially observed series).  NaNs in
    ``data`` are treated as missing: their likelihood terms drop out via
    an element-wise mask, and — for AR(p) series — every term whose LAG
    WINDOW touches a missing value is masked too (its conditional mean
    would involve the unobserved point).  Missing positions are filled
    with 0 in the stored value purely to keep arithmetic NaN-free; they
    contribute nothing to any log-density.
    """
    import numpy as np

    from .variables import RandomVariable

    arr = np.asarray(data, np.float32)
    finite = np.isfinite(arr)
    filled = np.where(finite, arr, 0.0).astype(np.float32)
    mask = finite.astype(np.float32)

    if isinstance(series_var, RandomVariable) and isinstance(
        series_var.distribution, AutoRegressive
    ):
        p = series_var.distribution.order
        term_ok = finite.copy()
        # term t >= p is valid only if x_t and lags x_{t-1..t-p} observed
        for i in range(1, p + 1):
            term_ok[p:] &= finite[p - i : arr.shape[0] - i]
        mask = term_ok.astype(np.float32)

    series_var.observe(jnp.asarray(filled))
    series_var.log_prob_mask = jnp.asarray(mask)


def Timeseries(data):
    """Convenience wrapper marking a partially observed series: returns
    (filled_values, observation_mask) with NaNs as the missing marker."""
    import numpy as np

    arr = np.asarray(data, np.float32)
    finite = np.isfinite(arr)
    return (
        jnp.asarray(np.where(finite, arr, 0.0).astype(np.float32)),
        jnp.asarray(finite.astype(np.float32)),
    )


class GaussianHMM(Distribution):
    """Hidden Markov model with Gaussian emissions, latent states summed
    out EXACTLY by the forward algorithm (one `lax.scan` over time whose
    body is a [K]x[K,K] matvec — MXU/VPU work, numerically stable in log
    space).  This covers the discrete-CHAIN case that element-wise
    enumeration (compiler.enumerated_log_density) cannot: interacting
    discrete latents along time.

    Parameters (all may be links — priors over them make the HMM fully
    NUTS-able since the discrete states never enter the sampler):
      init_logits [K], trans_logits [K, K] (rows normalize), locs [K],
      scales [K].
    """

    param_names = ("init_logits", "trans_logits", "locs", "scales")
    param_event_ndims = {"init_logits": 1, "trans_logits": 2,
                         "locs": 1, "scales": 1}
    reparameterized = False
    support = REAL
    event_ndim = 1

    def __init__(self, length: int):
        self.length = int(length)

    def sample(self, key, *, init_logits, trans_logits, locs, scales):
        k_s0, k_scan = jax.random.split(key)
        s0 = jax.random.categorical(k_s0, init_logits)

        def step(s, k):
            k_tr, k_em = jax.random.split(k)
            y = locs[s] + scales[s] * jax.random.normal(k_em, ())
            s_next = jax.random.categorical(k_tr, trans_logits[s])
            return s_next, y

        keys = jax.random.split(k_scan, self.length)
        _, ys = jax.lax.scan(step, s0, keys)
        return ys

    def log_prob(self, value, *, init_logits, trans_logits, locs, scales):
        """Forward algorithm in log space; returns a per-SERIES scalar
        (event_ndim=1: the time axis is the event)."""
        log_init = jax.nn.log_softmax(init_logits)
        log_trans = jax.nn.log_softmax(trans_logits, axis=-1)  # [K, K]

        def emis(y):  # [K] per-state emission log-densities
            return (
                -0.5 * ((y - locs) / scales) ** 2
                - jnp.log(scales)
                - 0.5 * jnp.log(2.0 * jnp.pi)
            )

        def step(log_alpha, y):
            # log_alpha [K] -> logsumexp_k (alpha_k + trans_kj) + emis_j(y)
            la = jax.nn.logsumexp(log_alpha[:, None] + log_trans, axis=0)
            log_alpha = la + emis(y)
            return log_alpha, None

        log_alpha0 = log_init + emis(value[0])
        log_alpha, _ = jax.lax.scan(step, log_alpha0, value[1:])
        return jax.nn.logsumexp(log_alpha)

    def mean(self, *, init_logits, trans_logits, locs, scales):
        p = jax.nn.softmax(init_logits)
        return jnp.full((self.length,), jnp.dot(p, locs))


class EmissionHMM(Distribution):
    """Hidden Markov model with ANY emission family (ROADMAP r2 #7).

    Generalizes :class:`GaussianHMM`: the latent state chain is summed
    out EXACTLY by the same log-space forward algorithm, but emissions
    come from an arbitrary :class:`Distribution` (Poisson counts,
    Bernoulli spikes, MVN observations, ...).  Emission parameters are
    supplied with a LEADING STATE AXIS ``[K, ...]`` under link names
    ``emission_<param>``; init/transition logits as in GaussianHMM.  All
    parameters accept links, so priors over them make the HMM fully
    NUTS-able — the discrete states never enter the sampler.

    The per-timestep emission table is a ``vmap`` over the state axis of
    the emission kernel: one batched evaluation per scan step, fused by
    XLA into the [K]x[K,K] forward contraction.
    """

    reparameterized = False

    def __init__(self, length: int, emission: Distribution):
        self.length = int(length)
        self.emission = emission
        em_names = tuple(f"emission_{p}" for p in emission.param_names)
        self.param_names = ("init_logits", "trans_logits") + em_names
        evr = {"init_logits": 1, "trans_logits": 2}
        base_evr = getattr(emission, "param_event_ndims", {}) or {}
        for p in emission.param_names:
            evr[f"emission_{p}"] = (
                base_evr.get(p, emission.event_ndim) + 1
            )
        self.param_event_ndims = evr
        self.support = emission.support
        self.event_ndim = 1 + emission.event_ndim
        self.is_discrete = emission.is_discrete

    def _split(self, params):
        em = {k[len("emission_"):]: v for k, v in params.items()
              if k.startswith("emission_")}
        return params["init_logits"], params["trans_logits"], em

    def _emission_logp(self, y, em_params):
        """Per-state emission log-densities [K] for one timestep value."""
        def one(kp):
            lp = self.emission.log_prob(y, **kp)
            return jnp.sum(lp)  # reduce emission event dims

        return jax.vmap(one)(em_params)

    def sample(self, key, **params):
        init_logits, trans_logits, em = self._split(params)
        k_s0, k_scan = jax.random.split(key)
        s0 = jax.random.categorical(k_s0, init_logits)

        def step(s, k):
            k_tr, k_em = jax.random.split(k)
            y = self.emission.sample(
                k_em, **{p: v[s] for p, v in em.items()}
            )
            s_next = jax.random.categorical(k_tr, trans_logits[s])
            return s_next, y

        keys = jax.random.split(k_scan, self.length)
        _, ys = jax.lax.scan(step, s0, keys)
        return ys

    def log_prob(self, value, **params):
        """Forward algorithm in log space; per-series scalar."""
        init_logits, trans_logits, em = self._split(params)
        log_init = jax.nn.log_softmax(init_logits)
        log_trans = jax.nn.log_softmax(trans_logits, axis=-1)

        def step(log_alpha, y):
            la = jax.nn.logsumexp(log_alpha[:, None] + log_trans, axis=0)
            return la + self._emission_logp(y, em), None

        log_alpha0 = log_init + self._emission_logp(value[0], em)
        log_alpha, _ = jax.lax.scan(step, log_alpha0, value[1:])
        return jax.nn.logsumexp(log_alpha)

    def posterior_marginals(self, value, **params):
        """Forward-backward smoothing p(s_t = k | y_{1:T}) as [T, K]."""
        init_logits, trans_logits, em = self._split(params)
        log_init = jax.nn.log_softmax(jnp.asarray(init_logits))
        log_trans = jax.nn.log_softmax(jnp.asarray(trans_logits), axis=-1)
        value = jnp.asarray(value)
        emis = lambda y: self._emission_logp(y, em)

        def fwd(log_alpha, y):
            la = jax.nn.logsumexp(log_alpha[:, None] + log_trans, axis=0) + emis(y)
            return la, la

        la0 = log_init + emis(value[0])
        _, log_alphas = jax.lax.scan(fwd, la0, value[1:])
        log_alphas = jnp.concatenate([la0[None], log_alphas], axis=0)

        def bwd(log_beta, y):
            lb = jax.nn.logsumexp(
                log_trans + (emis(y) + log_beta)[None, :], axis=1
            )
            return lb, lb

        k = log_init.shape[0]
        lb_last = jnp.zeros((k,))
        _, log_betas_rev = jax.lax.scan(bwd, lb_last, value[1:][::-1])
        log_betas = jnp.concatenate([log_betas_rev[::-1], lb_last[None]], axis=0)
        return jax.nn.softmax(log_alphas + log_betas, axis=-1)

    def viterbi(self, value, **params):
        """MAP state path argmax_s log p(s, y) as int32[T]: max-product
        forward recursion + backtrace, each one `lax.scan` (no Python
        loop over time — compiles to a fixed-length program)."""
        init_logits, trans_logits, em = self._split(params)
        log_init = jax.nn.log_softmax(jnp.asarray(init_logits))
        log_trans = jax.nn.log_softmax(jnp.asarray(trans_logits), axis=-1)
        value = jnp.asarray(value)
        emis = lambda y: self._emission_logp(y, em)

        def fwd(delta, y):
            scores = delta[:, None] + log_trans  # [K_prev, K_next]
            best_prev = jnp.argmax(scores, axis=0)
            delta = jnp.max(scores, axis=0) + emis(y)
            return delta, best_prev

        d0 = log_init + emis(value[0])
        d_last, back = jax.lax.scan(fwd, d0, value[1:])
        s_last = jnp.argmax(d_last)

        def bwd(s, bp):
            s_prev = bp[s]
            return s_prev, s_prev

        _, path_rev = jax.lax.scan(bwd, s_last, back[::-1])
        return jnp.concatenate([path_rev[::-1], s_last[None]], axis=0)


def EmissionHMMVariable(length, emission, init_logits, trans_logits,
                        name=None, **emission_params):
    """HMM series variable with an arbitrary emission family.

    ``emission_params`` bind the emission distribution's parameters with
    a leading state axis [K, ...]; every position accepts constants,
    variables or expressions.  Example::

        rates = LogNormalVariable(0., 1., 'rates', plate=(3,))
        y = EmissionHMMVariable(200, Poisson(), init_logits=jnp.zeros(3),
                                trans_logits=T0, rate=rates, name='y')
    """
    from .variables import RandomVariable

    missing = set(emission.param_names) - set(emission_params)
    extra = set(emission_params) - set(emission.param_names)
    if missing or extra:
        raise ValueError(
            f"emission {type(emission).__name__} expects params "
            f"{emission.param_names}; missing {sorted(missing)}, "
            f"unknown {sorted(extra)}"
        )
    links = {"init_logits": init_logits, "trans_logits": trans_logits}
    links.update({f"emission_{p}": v for p, v in emission_params.items()})
    return RandomVariable(EmissionHMM(length, emission), name=name,
                          links=links)


def hmm_posterior_marginals(value, *, init_logits, trans_logits, locs, scales):
    """Forward-backward smoothing: p(s_t = k | y_{1:T}) as [T, K].

    Companion to GaussianHMM: decode the latent-state posterior at fixed
    (or posterior-mean) parameters.  Pure scans, jit/vmap-friendly.
    """
    log_init = jax.nn.log_softmax(jnp.asarray(init_logits))
    log_trans = jax.nn.log_softmax(jnp.asarray(trans_logits), axis=-1)
    locs = jnp.asarray(locs)
    scales = jnp.asarray(scales)
    value = jnp.asarray(value)

    def emis(y):
        return (
            -0.5 * ((y - locs) / scales) ** 2
            - jnp.log(scales)
            - 0.5 * jnp.log(2.0 * jnp.pi)
        )

    def fwd(log_alpha, y):
        la = jax.nn.logsumexp(log_alpha[:, None] + log_trans, axis=0) + emis(y)
        return la, la

    la0 = log_init + emis(value[0])
    _, log_alphas = jax.lax.scan(fwd, la0, value[1:])
    log_alphas = jnp.concatenate([la0[None], log_alphas], axis=0)  # [T, K]

    def bwd(log_beta, y):
        lb = jax.nn.logsumexp(log_trans + (emis(y) + log_beta)[None, :], axis=1)
        return lb, lb

    k = locs.shape[0]
    lb_last = jnp.zeros((k,))
    _, log_betas_rev = jax.lax.scan(bwd, lb_last, value[1:][::-1])
    log_betas = jnp.concatenate(
        [log_betas_rev[::-1], lb_last[None]], axis=0
    )  # [T, K]

    log_post = log_alphas + log_betas
    return jax.nn.softmax(log_post, axis=-1)


def HMMVariable(length, init_logits, trans_logits, locs, scales,
                name=None):
    """Gaussian-emission HMM series variable (states marginalized).

    Every parameter position accepts constants, variables or expressions
    — put priors on locs/scales/transitions and run NUTS directly.
    """
    from .variables import RandomVariable

    return RandomVariable(
        GaussianHMM(length),
        name=name,
        links={
            "init_logits": init_logits,
            "trans_logits": trans_logits,
            "locs": locs,
            "scales": scales,
        },
    )
