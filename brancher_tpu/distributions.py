"""Pure-JAX distribution kernels.

Reference parity: Brancher's ``distributions.py`` adapts
``torch.distributions`` to its calling convention — classes exposing
``get_sample(n, **params)`` / ``calculate_log_probability(value, **params)``
with a leading sample axis (SURVEY.md §2 "Distribution wrappers", §3.2/3.3).

TPU-first redesign: each distribution here is a *stateless pair of pure
functions* operating on a SINGLE sample (no sample axis).  The graph
compiler vmaps the whole model over the sample axis once, so kernels stay
simple, fuse well under XLA, and the same kernel serves forward sampling,
NUTS log-joints, SVI and SMC.  Parameters arrive pre-broadcast-compatible;
``sample`` returns an array of the broadcast shape, ``log_prob`` returns an
elementwise array which the compiler reduces with a sum (matching the
reference's "sum over event dims" behaviour).

Each class also declares:
  * ``reparameterized`` — whether ``sample`` is differentiable w.r.t. its
    parameters (pathwise gradients for SVI).
  * ``support`` — the constraint of the sample space, used to build the
    unconstraining bijection for HMC/NUTS.
  * ``is_discrete`` — discrete distributions are excluded from HMC
    positions and from pathwise gradients.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

Array = jax.Array

_LOG_2PI = math.log(2.0 * math.pi)

# ---------------------------------------------------------------------------
# Supports (constraints).  Plain string tags keep the registry trivially
# hashable/static for jit.
# ---------------------------------------------------------------------------
REAL = "real"
POSITIVE = "positive"
UNIT_INTERVAL = "unit_interval"
SIMPLEX = "simplex"
INTERVAL = "interval"  # (low, high), dynamic bounds
INTEGER = "integer"
CORR_CHOL = "corr_cholesky"


def _bshape(*params):
    return jnp.broadcast_shapes(*(jnp.shape(p) for p in params))


class Distribution:
    """Base class: a named bundle of pure kernels (no state)."""

    param_names: tuple = ()
    # event rank PER PARAMETER (defaults to event_ndim for every param);
    # lets plate expansion broadcast e.g. an MVN's [d] loc and [d,d]
    # scale_tril consistently
    param_event_ndims: dict = {}
    reparameterized: bool = False
    is_discrete: bool = False
    support: str = REAL
    # number of trailing event dims of a sampled value
    event_ndim: int = 0

    def sample(self, key: Array, **params) -> Array:
        raise NotImplementedError

    def log_prob(self, value: Array, **params) -> Array:
        raise NotImplementedError

    # -- mean/variance where tractable (used by tests & moment queries) ----
    def mean(self, **params):
        raise NotImplementedError

    def variance(self, **params):
        raise NotImplementedError

    def __repr__(self):
        return type(self).__name__


# ---------------------------------------------------------------------------
# Location-scale continuous families
# ---------------------------------------------------------------------------
class Normal(Distribution):
    param_names = ("loc", "scale")
    reparameterized = True
    support = REAL

    def sample(self, key, *, loc, scale):
        shape = _bshape(loc, scale)
        eps = jax.random.normal(key, shape, dtype=jnp.result_type(loc, scale, float))
        return loc + scale * eps

    def log_prob(self, value, *, loc, scale):
        z = (value - loc) / scale
        return -0.5 * (z * z + _LOG_2PI) - jnp.log(scale)

    def mean(self, *, loc, scale):
        return jnp.broadcast_to(loc, _bshape(loc, scale))

    def variance(self, *, loc, scale):
        return jnp.broadcast_to(scale**2, _bshape(loc, scale))


class LogNormal(Distribution):
    param_names = ("loc", "scale")
    reparameterized = True
    support = POSITIVE

    def sample(self, key, *, loc, scale):
        return jnp.exp(Normal().sample(key, loc=loc, scale=scale))

    def log_prob(self, value, *, loc, scale):
        logv = jnp.log(value)
        return Normal().log_prob(logv, loc=loc, scale=scale) - logv

    def mean(self, *, loc, scale):
        return jnp.exp(loc + 0.5 * scale**2)

    def variance(self, *, loc, scale):
        return (jnp.exp(scale**2) - 1.0) * jnp.exp(2 * loc + scale**2)


class HalfNormal(Distribution):
    param_names = ("scale",)
    reparameterized = True
    support = POSITIVE

    def sample(self, key, *, scale):
        return jnp.abs(Normal().sample(key, loc=jnp.zeros_like(scale), scale=scale))

    def log_prob(self, value, *, scale):
        z = value / scale
        return -0.5 * (z * z + _LOG_2PI) - jnp.log(scale) + math.log(2.0)

    def mean(self, *, scale):
        return scale * math.sqrt(2.0 / math.pi)

    def variance(self, *, scale):
        return scale**2 * (1.0 - 2.0 / math.pi)


class Cauchy(Distribution):
    param_names = ("loc", "scale")
    reparameterized = True
    support = REAL

    def sample(self, key, *, loc, scale):
        shape = _bshape(loc, scale)
        eps = jax.random.cauchy(key, shape, dtype=jnp.result_type(loc, scale, float))
        return loc + scale * eps

    def log_prob(self, value, *, loc, scale):
        z = (value - loc) / scale
        return -jnp.log1p(z * z) - jnp.log(scale) - math.log(math.pi)


class HalfCauchy(Distribution):
    param_names = ("scale",)
    reparameterized = True
    support = POSITIVE

    def sample(self, key, *, scale):
        return jnp.abs(Cauchy().sample(key, loc=jnp.zeros_like(scale), scale=scale))

    def log_prob(self, value, *, scale):
        z = value / scale
        return -jnp.log1p(z * z) - jnp.log(scale) + math.log(2.0 / math.pi)


class Laplace(Distribution):
    param_names = ("loc", "scale")
    reparameterized = True
    support = REAL

    def sample(self, key, *, loc, scale):
        shape = _bshape(loc, scale)
        eps = jax.random.laplace(key, shape, dtype=jnp.result_type(loc, scale, float))
        return loc + scale * eps

    def log_prob(self, value, *, loc, scale):
        return -jnp.abs(value - loc) / scale - jnp.log(2.0 * scale)

    def mean(self, *, loc, scale):
        return jnp.broadcast_to(loc, _bshape(loc, scale))

    def variance(self, *, loc, scale):
        return jnp.broadcast_to(2.0 * scale**2, _bshape(loc, scale))


class Logistic(Distribution):
    param_names = ("loc", "scale")
    reparameterized = True
    support = REAL

    def sample(self, key, *, loc, scale):
        shape = _bshape(loc, scale)
        eps = jax.random.logistic(key, shape, dtype=jnp.result_type(loc, scale, float))
        return loc + scale * eps

    def log_prob(self, value, *, loc, scale):
        z = (value - loc) / scale
        return -z - 2.0 * jax.nn.softplus(-z) - jnp.log(scale)


class StudentT(Distribution):
    param_names = ("df", "loc", "scale")
    reparameterized = True
    support = REAL

    def sample(self, key, *, df, loc, scale):
        shape = _bshape(df, loc, scale)
        eps = jax.random.t(key, df, shape, dtype=jnp.result_type(loc, scale, float))
        return loc + scale * eps

    def log_prob(self, value, *, df, loc, scale):
        z = (value - loc) / scale
        lp = (
            jsp.gammaln(0.5 * (df + 1.0))
            - jsp.gammaln(0.5 * df)
            - 0.5 * jnp.log(df * math.pi)
            - jnp.log(scale)
            - 0.5 * (df + 1.0) * jnp.log1p(z * z / df)
        )
        return lp


class TruncatedNormal(Distribution):
    """Normal truncated to [low, high], sampled by inverse-CDF (ndtri) —
    shape-static and reparameterized, unlike rejection sampling."""

    param_names = ("loc", "scale", "low", "high")
    reparameterized = True
    support = INTERVAL

    def _cdf_bounds(self, loc, scale, low, high):
        from jax.scipy.stats import norm

        a = norm.cdf((low - loc) / scale)
        b = norm.cdf((high - loc) / scale)
        return a, b

    def sample(self, key, *, loc, scale, low, high):
        shape = _bshape(loc, scale, low, high)
        a, b = self._cdf_bounds(loc, scale, low, high)
        u = jax.random.uniform(key, shape, dtype=jnp.result_type(loc, scale, float),
                               minval=1e-6, maxval=1.0 - 1e-6)
        p = a + (b - a) * u
        return loc + scale * jsp.ndtri(p)

    def log_prob(self, value, *, loc, scale, low, high):
        a, b = self._cdf_bounds(loc, scale, low, high)
        z = (value - loc) / scale
        lp = -0.5 * (z * z + _LOG_2PI) - jnp.log(scale) - jnp.log(b - a)
        inside = (value >= low) & (value <= high)
        return jnp.where(inside, lp, -jnp.inf)


class Uniform(Distribution):
    param_names = ("low", "high")
    reparameterized = True
    support = INTERVAL

    def sample(self, key, *, low, high):
        shape = _bshape(low, high)
        u = jax.random.uniform(key, shape, dtype=jnp.result_type(low, high, float))
        return low + (high - low) * u

    def log_prob(self, value, *, low, high):
        inside = (value >= low) & (value <= high)
        lp = -jnp.log(high - low)
        return jnp.where(inside, lp, -jnp.inf)

    def mean(self, *, low, high):
        return 0.5 * (low + high)

    def variance(self, *, low, high):
        return (high - low) ** 2 / 12.0


# ---------------------------------------------------------------------------
# Positive-support families (gamma family uses JAX's implicitly
# reparameterized gamma sampler, so pathwise gradients flow).
# ---------------------------------------------------------------------------
class Gamma(Distribution):
    param_names = ("concentration", "rate")
    reparameterized = True  # implicit reparameterization in jax.random.gamma
    support = POSITIVE

    def sample(self, key, *, concentration, rate):
        shape = _bshape(concentration, rate)
        g = jax.random.gamma(key, concentration, shape)
        return g / rate

    def log_prob(self, value, *, concentration, rate):
        return (
            concentration * jnp.log(rate)
            + (concentration - 1.0) * jnp.log(value)
            - rate * value
            - jsp.gammaln(concentration)
        )

    def mean(self, *, concentration, rate):
        return concentration / rate

    def variance(self, *, concentration, rate):
        return concentration / rate**2


class InverseGamma(Distribution):
    param_names = ("concentration", "scale")
    reparameterized = True
    support = POSITIVE

    def sample(self, key, *, concentration, scale):
        g = Gamma().sample(key, concentration=concentration, rate=scale)
        return 1.0 / g

    def log_prob(self, value, *, concentration, scale):
        return (
            concentration * jnp.log(scale)
            - (concentration + 1.0) * jnp.log(value)
            - scale / value
            - jsp.gammaln(concentration)
        )


class Exponential(Distribution):
    param_names = ("rate",)
    reparameterized = True
    support = POSITIVE

    def sample(self, key, *, rate):
        u = jax.random.exponential(key, jnp.shape(rate), dtype=jnp.result_type(rate, float))
        return u / rate

    def log_prob(self, value, *, rate):
        return jnp.log(rate) - rate * value

    def mean(self, *, rate):
        return 1.0 / rate

    def variance(self, *, rate):
        return 1.0 / rate**2


class Chi2(Distribution):
    param_names = ("df",)
    reparameterized = True
    support = POSITIVE

    def sample(self, key, *, df):
        return Gamma().sample(key, concentration=0.5 * df, rate=jnp.full_like(df, 0.5))

    def log_prob(self, value, *, df):
        return Gamma().log_prob(value, concentration=0.5 * df, rate=0.5)


class Beta(Distribution):
    param_names = ("alpha", "beta")
    reparameterized = True
    support = UNIT_INTERVAL

    def sample(self, key, *, alpha, beta):
        k1, k2 = jax.random.split(key)
        shape = _bshape(alpha, beta)
        ga = jax.random.gamma(k1, jnp.broadcast_to(alpha, shape))
        gb = jax.random.gamma(k2, jnp.broadcast_to(beta, shape))
        return ga / (ga + gb)

    def log_prob(self, value, *, alpha, beta):
        return (
            (alpha - 1.0) * jnp.log(value)
            + (beta - 1.0) * jnp.log1p(-value)
            - (jsp.gammaln(alpha) + jsp.gammaln(beta) - jsp.gammaln(alpha + beta))
        )

    def mean(self, *, alpha, beta):
        return alpha / (alpha + beta)

    def variance(self, *, alpha, beta):
        s = alpha + beta
        return alpha * beta / (s * s * (s + 1.0))


# ---------------------------------------------------------------------------
# Discrete families
# ---------------------------------------------------------------------------
def _resolve_probs_logits(probs, logits):
    if (probs is None) == (logits is None):
        raise ValueError("exactly one of probs/logits must be given")
    if probs is not None:
        logits = jnp.log(probs) - jnp.log1p(-probs)
    return logits


class Bernoulli(Distribution):
    param_names = ("probs", "logits")
    is_discrete = True
    support = INTEGER

    def sample(self, key, *, probs=None, logits=None):
        logits = _resolve_probs_logits(probs, logits)
        return jax.random.bernoulli(key, jax.nn.sigmoid(logits)).astype(jnp.int32)

    def log_prob(self, value, *, probs=None, logits=None):
        logits = _resolve_probs_logits(probs, logits)
        v = value.astype(logits.dtype) if hasattr(value, "astype") else jnp.asarray(value, logits.dtype)
        # -softplus(-l)*v - softplus(l)*(1-v), numerically stable
        return v * logits - jax.nn.softplus(logits)

    def mean(self, *, probs=None, logits=None):
        logits = _resolve_probs_logits(probs, logits)
        return jax.nn.sigmoid(logits)

    def variance(self, *, probs=None, logits=None):
        p = self.mean(probs=probs, logits=logits)
        return p * (1.0 - p)


class Binomial(Distribution):
    param_names = ("total_count", "probs", "logits")
    is_discrete = True
    support = INTEGER

    def sample(self, key, *, total_count, probs=None, logits=None):
        logits = _resolve_probs_logits(probs, logits)
        p = jax.nn.sigmoid(logits)
        n = jnp.asarray(total_count)
        shape = _bshape(n, p)
        return jax.random.binomial(key, n.astype(jnp.float32), jnp.broadcast_to(p, shape)).astype(jnp.int32)

    def log_prob(self, value, *, total_count, probs=None, logits=None):
        logits = _resolve_probs_logits(probs, logits)
        n = jnp.asarray(total_count, dtype=logits.dtype)
        v = jnp.asarray(value, dtype=logits.dtype)
        log_comb = jsp.gammaln(n + 1.0) - jsp.gammaln(v + 1.0) - jsp.gammaln(n - v + 1.0)
        return log_comb + v * logits - n * jax.nn.softplus(logits)


class Poisson(Distribution):
    param_names = ("rate",)
    is_discrete = True
    support = INTEGER

    def sample(self, key, *, rate):
        return jax.random.poisson(key, rate)

    def log_prob(self, value, *, rate):
        v = jnp.asarray(value, dtype=jnp.result_type(rate, float))
        return v * jnp.log(rate) - rate - jsp.gammaln(v + 1.0)


class Geometric(Distribution):
    """Number of failures before first success; support {0,1,...}."""

    param_names = ("probs", "logits")
    is_discrete = True
    support = INTEGER

    def sample(self, key, *, probs=None, logits=None):
        logits = _resolve_probs_logits(probs, logits)
        p = jax.nn.sigmoid(logits)
        u = jax.random.uniform(key, jnp.shape(p))
        return jnp.floor(jnp.log1p(-u) / jnp.log1p(-p)).astype(jnp.int32)

    def log_prob(self, value, *, probs=None, logits=None):
        logits = _resolve_probs_logits(probs, logits)
        v = jnp.asarray(value, dtype=logits.dtype)
        # log p + v * log(1-p)
        return -jax.nn.softplus(-logits) + v * (-jax.nn.softplus(logits))


class Categorical(Distribution):
    """Integer-valued categorical; trailing param axis indexes classes."""

    param_names = ("probs", "logits")
    is_discrete = True
    support = INTEGER
    event_ndim = 0  # value drops the class axis

    def _logits(self, probs, logits):
        if (probs is None) == (logits is None):
            raise ValueError("exactly one of probs/logits must be given")
        return jnp.log(probs) if logits is None else logits

    def sample(self, key, *, probs=None, logits=None):
        lg = self._logits(probs, logits)
        return jax.random.categorical(key, lg, axis=-1)

    def log_prob(self, value, *, probs=None, logits=None):
        lg = jax.nn.log_softmax(self._logits(probs, logits), axis=-1)
        value = jnp.asarray(value, dtype=jnp.int32)
        return jnp.take_along_axis(lg, value[..., None], axis=-1)[..., 0]


class Concrete(Distribution):
    """Gumbel-softmax relaxed one-hot (Maddison et al.).

    Matches the reference's ConcreteVariable capability (SURVEY.md §2
    "Distribution wrappers": Gumbel-softmax relaxation) with a
    reparameterized TPU-friendly sampler.  Value is a point on the simplex
    (trailing class axis = event dim).
    """

    param_names = ("temperature", "logits")
    param_event_ndims = {"temperature": 0, "logits": 1}
    reparameterized = True
    support = SIMPLEX
    event_ndim = 1

    def sample(self, key, *, temperature, logits):
        g = jax.random.gumbel(key, jnp.shape(logits), dtype=logits.dtype)
        return jax.nn.softmax((logits + g) / temperature, axis=-1)

    def log_prob(self, value, *, temperature, logits):
        k = jnp.shape(logits)[-1]
        t = temperature
        logv = jnp.log(value)
        score = logits - t * logv
        norm = jsp.logsumexp(score, axis=-1, keepdims=True)
        lp = (
            jsp.gammaln(jnp.asarray(float(k), logits.dtype))
            + (k - 1) * jnp.log(t)
            + jnp.sum(score - norm, axis=-1)
            - jnp.sum(logv, axis=-1)
        )
        return lp


# ---------------------------------------------------------------------------
# Multivariate families
# ---------------------------------------------------------------------------
class MultivariateNormal(Distribution):
    """MVN parameterized by loc + either covariance or its Cholesky.

    The Cholesky path is the fast path (one triangular solve, MXU-friendly);
    covariance input is factorized once per call.
    """

    param_names = ("loc", "covariance_matrix", "scale_tril")
    param_event_ndims = {"loc": 1, "covariance_matrix": 2, "scale_tril": 2}
    reparameterized = True
    support = REAL
    event_ndim = 1

    def _chol(self, covariance_matrix, scale_tril):
        if (covariance_matrix is None) == (scale_tril is None):
            raise ValueError("exactly one of covariance_matrix/scale_tril required")
        if scale_tril is None:
            scale_tril = jnp.linalg.cholesky(covariance_matrix)
        return scale_tril

    def sample(self, key, *, loc, covariance_matrix=None, scale_tril=None):
        L = self._chol(covariance_matrix, scale_tril)
        shape = jnp.broadcast_shapes(jnp.shape(loc), jnp.shape(L)[:-1])
        eps = jax.random.normal(key, shape, dtype=L.dtype)
        return loc + jnp.einsum("...ij,...j->...i", L, eps)

    def log_prob(self, value, *, loc, covariance_matrix=None, scale_tril=None):
        L = self._chol(covariance_matrix, scale_tril)
        d = value.shape[-1]
        diff = value - loc
        z = jax.scipy.linalg.solve_triangular(L, diff[..., None], lower=True)[..., 0]
        logdet = jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
        return -0.5 * jnp.sum(z * z, axis=-1) - logdet - 0.5 * d * _LOG_2PI

    def mean(self, *, loc, covariance_matrix=None, scale_tril=None):
        return loc


class Dirichlet(Distribution):
    param_names = ("concentration",)
    reparameterized = True
    support = SIMPLEX
    event_ndim = 1

    def sample(self, key, *, concentration):
        g = jax.random.gamma(key, concentration)
        return g / jnp.sum(g, axis=-1, keepdims=True)

    def log_prob(self, value, *, concentration):
        return (
            jnp.sum((concentration - 1.0) * jnp.log(value), axis=-1)
            + jsp.gammaln(jnp.sum(concentration, axis=-1))
            - jnp.sum(jsp.gammaln(concentration), axis=-1)
        )

    def mean(self, *, concentration):
        return concentration / jnp.sum(concentration, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Degenerate / data distributions
# ---------------------------------------------------------------------------
class Delta(Distribution):
    """Point mass.  log_prob is 0 at the point (continuous convention)."""

    param_names = ("value",)
    reparameterized = True
    support = REAL

    def sample(self, key, *, value):
        return value

    def log_prob(self, x, *, value):
        return jnp.zeros(jnp.broadcast_shapes(jnp.shape(x), jnp.shape(value)))

    def mean(self, *, value):
        return value


class Empirical(Distribution):
    """Uniform draws (rows) from a fixed dataset — powers minibatching.

    Reference parity: Brancher's EmpiricalDistribution subsamples a dataset
    and powers minibatch SVI (SURVEY.md §2).  Here the dataset is a static
    array; sampling draws `batch_size` row indices iid-uniform (or uses the
    provided indices).  ``is_discrete`` so it never enters HMC state.
    """

    param_names = ("dataset", "indices")
    is_discrete = True
    support = REAL

    def __init__(self, batch_size: Optional[int] = None):
        self.batch_size = batch_size

    def sample(self, key, *, dataset, indices=None):
        if indices is not None:
            return jnp.take(dataset, indices, axis=0)
        if self.batch_size is None:
            return dataset
        n = dataset.shape[0]
        idx = jax.random.randint(key, (self.batch_size,), 0, n)
        return jnp.take(dataset, idx, axis=0)

    def log_prob(self, value, *, dataset, indices=None):
        # a deterministic data draw given indices: density-free.  Return a
        # ZERO PER ROW (not a bare scalar) so masked/summed semantics and
        # shape bookkeeping stay consistent with the value's shape.
        return jnp.zeros(jnp.shape(value)[:1] if jnp.ndim(value) else ())


class RandomIndices(Distribution):
    """Uniform minibatch index sampler (with replacement).

    Reference parity: Brancher's RandomIndices minibatch sampler
    (SURVEY.md §2 "Standard variables").
    """

    param_names = ()
    is_discrete = True
    support = INTEGER

    def __init__(self, dataset_size: int, batch_size: int):
        self.dataset_size = int(dataset_size)
        self.batch_size = int(batch_size)

    def sample(self, key):
        return jax.random.randint(key, (self.batch_size,), 0, self.dataset_size)

    def log_prob(self, value):
        return jnp.zeros(())


# Registry for name-based lookup (used by serialization & tests).
DISTRIBUTIONS = {
    cls.__name__: cls
    for cls in [
        Normal, LogNormal, HalfNormal, Cauchy, HalfCauchy, Laplace, Logistic,
        StudentT, Uniform, Gamma, InverseGamma, Exponential, Chi2, Beta,
        TruncatedNormal, Bernoulli, Binomial, Poisson, Geometric, Categorical, Concrete,
        MultivariateNormal, Dirichlet, Delta, Empirical, RandomIndices,
    ]
}


class Mixture(Distribution):
    """Finite mixture with EXPLICITLY MARGINALIZED component assignment.

    Component parameters carry a leading K axis; ``log_prob`` is
    logsumexp over components — smooth in all continuous parameters, so
    mixtures work directly as HMC/NUTS likelihoods and latents (no
    discrete latent enters the sampler; this is the enumeration-free
    TPU-friendly mixture formulation).

    Example::

        m = Mixture(Normal())
        m.log_prob(x, probs=w[K], loc=mu[K], scale=sig[K])
    """

    def __init__(self, component_dist: "Distribution"):
        self.component = component_dist
        self.param_names = ("probs", "logits") + tuple(component_dist.param_names)
        self.support = component_dist.support
        self.reparameterized = False  # sampling draws a discrete index

    def _log_weights(self, probs, logits):
        if (probs is None) == (logits is None):
            raise ValueError("exactly one of probs/logits must be given")
        return jnp.log(probs) if logits is None else jax.nn.log_softmax(logits)

    @staticmethod
    def _expand(v, k):
        """Give every component parameter a leading K axis (scalars and
        shared params broadcast)."""
        v = jnp.asarray(v)
        if v.ndim == 0:
            return jnp.broadcast_to(v, (k,))
        if v.shape[0] == k:
            return v
        return jnp.broadcast_to(v, (k,) + v.shape)

    def sample(self, key, *, probs=None, logits=None, **comp_params):
        lw = self._log_weights(probs, logits)
        k_n = lw.shape[0]
        comp_params = {k_: self._expand(v, k_n) for k_, v in comp_params.items()}
        k_idx, k_comp = jax.random.split(key)
        idx = jax.random.categorical(k_idx, lw)
        chosen = {k: jnp.take(v, idx, axis=0) for k, v in comp_params.items()}
        return self.component.sample(k_comp, **chosen)

    def log_prob(self, value, *, probs=None, logits=None, **comp_params):
        lw = self._log_weights(probs, logits)  # [K]
        k = lw.shape[0]
        comp_params = {k_: self._expand(v, k) for k_, v in comp_params.items()}

        def comp_lp(i):
            p_i = {key_: v[i] for key_, v in comp_params.items()}
            lp = self.component.log_prob(value, **p_i)
            # reduce event dims so mixing happens per data point
            if self.component.event_ndim:
                lp = jnp.sum(lp, axis=tuple(range(-self.component.event_ndim, 0)))
            return lp

        lps = jnp.stack([comp_lp(i) for i in range(k)])  # [K, ...]
        shape = [k] + [1] * (lps.ndim - 1)
        return jsp.logsumexp(lps + lw.reshape(shape), axis=0)

    def mean(self, *, probs=None, logits=None, **comp_params):
        lw = self._log_weights(probs, logits)
        w = jnp.exp(lw)
        comp_params = {k_: self._expand(v, w.shape[0]) for k_, v in comp_params.items()}
        means = jnp.stack([
            self.component.mean(**{k_: v[i] for k_, v in comp_params.items()})
            for i in range(w.shape[0])
        ])
        return jnp.tensordot(w, means, axes=(0, 0))


DISTRIBUTIONS["Mixture"] = Mixture
