"""User-facing variable constructors (the standard variable zoo).

Reference parity: Brancher's ``standard_variables.py`` — one constructor
class per distribution, each accepting scalars / arrays / variables /
expressions in every parameter position (SURVEY.md §2 "Standard
variables"; roster per SURVEY.md L4).  Constructor call signatures keep the
reference's positional style, e.g. ``NormalVariable(mu, sigma, "x")``.

TPU-first: constructors produce plain ``RandomVariable`` data nodes over
the pure distribution kernels in ``distributions.py``; nothing here
executes until compilation.
"""
from __future__ import annotations

from . import distributions as D
from .variables import DeterministicVariable, RandomVariable  # noqa: F401 (re-export)

__all__ = [
    "NormalVariable", "LogNormalVariable", "HalfNormalVariable",
    "CauchyVariable", "HalfCauchyVariable", "LaplaceVariable",
    "LogisticVariable", "StudentTVariable", "UniformVariable", "TruncatedNormalVariable",
    "GammaVariable", "InverseGammaVariable", "ExponentialVariable",
    "Chi2Variable", "BetaVariable", "BernoulliVariable", "BinomialVariable",
    "PoissonVariable", "GeometricVariable", "CategoricalVariable",
    "ConcreteVariable", "MultivariateNormalVariable", "DirichletVariable", "MixtureVariable",
    "DeterministicVariable", "EmpiricalVariable", "RandomIndices",
    "NonCenteredNormalVariable",
]


def _rv(dist, links, name, plate_shape, log_prob_scale, is_observed=None):
    rv = RandomVariable(
        dist,
        name=name,
        links=links,
        plate_shape=tuple(plate_shape or ()),
        log_prob_scale=log_prob_scale,
    )
    if is_observed is not None and not isinstance(is_observed, bool):
        rv.observe(is_observed)
    return rv


def NormalVariable(loc, scale, name=None, plate_shape=(), log_prob_scale=1.0, observed=None):
    return _rv(D.Normal(), {"loc": loc, "scale": scale}, name, plate_shape, log_prob_scale, observed)


def LogNormalVariable(loc, scale, name=None, plate_shape=(), log_prob_scale=1.0, observed=None):
    return _rv(D.LogNormal(), {"loc": loc, "scale": scale}, name, plate_shape, log_prob_scale, observed)


def HalfNormalVariable(scale, name=None, plate_shape=(), log_prob_scale=1.0, observed=None):
    return _rv(D.HalfNormal(), {"scale": scale}, name, plate_shape, log_prob_scale, observed)


def CauchyVariable(loc, scale, name=None, plate_shape=(), log_prob_scale=1.0, observed=None):
    return _rv(D.Cauchy(), {"loc": loc, "scale": scale}, name, plate_shape, log_prob_scale, observed)


def HalfCauchyVariable(scale, name=None, plate_shape=(), log_prob_scale=1.0, observed=None):
    return _rv(D.HalfCauchy(), {"scale": scale}, name, plate_shape, log_prob_scale, observed)


def LaplaceVariable(loc, scale, name=None, plate_shape=(), log_prob_scale=1.0, observed=None):
    return _rv(D.Laplace(), {"loc": loc, "scale": scale}, name, plate_shape, log_prob_scale, observed)


def LogisticVariable(loc, scale, name=None, plate_shape=(), log_prob_scale=1.0, observed=None):
    return _rv(D.Logistic(), {"loc": loc, "scale": scale}, name, plate_shape, log_prob_scale, observed)


def StudentTVariable(df, loc, scale, name=None, plate_shape=(), log_prob_scale=1.0, observed=None):
    return _rv(D.StudentT(), {"df": df, "loc": loc, "scale": scale}, name, plate_shape, log_prob_scale, observed)


def TruncatedNormalVariable(loc, scale, low, high, name=None, plate_shape=(), log_prob_scale=1.0, observed=None):
    return _rv(
        D.TruncatedNormal(),
        {"loc": loc, "scale": scale, "low": low, "high": high},
        name, plate_shape, log_prob_scale, observed,
    )


def UniformVariable(low, high, name=None, plate_shape=(), log_prob_scale=1.0, observed=None):
    return _rv(D.Uniform(), {"low": low, "high": high}, name, plate_shape, log_prob_scale, observed)


def GammaVariable(concentration, rate, name=None, plate_shape=(), log_prob_scale=1.0, observed=None):
    return _rv(D.Gamma(), {"concentration": concentration, "rate": rate}, name, plate_shape, log_prob_scale, observed)


def InverseGammaVariable(concentration, scale, name=None, plate_shape=(), log_prob_scale=1.0, observed=None):
    return _rv(D.InverseGamma(), {"concentration": concentration, "scale": scale}, name, plate_shape, log_prob_scale, observed)


def ExponentialVariable(rate, name=None, plate_shape=(), log_prob_scale=1.0, observed=None):
    return _rv(D.Exponential(), {"rate": rate}, name, plate_shape, log_prob_scale, observed)


def Chi2Variable(df, name=None, plate_shape=(), log_prob_scale=1.0, observed=None):
    return _rv(D.Chi2(), {"df": df}, name, plate_shape, log_prob_scale, observed)


def BetaVariable(alpha, beta, name=None, plate_shape=(), log_prob_scale=1.0, observed=None):
    return _rv(D.Beta(), {"alpha": alpha, "beta": beta}, name, plate_shape, log_prob_scale, observed)


def BernoulliVariable(probs=None, name=None, logits=None, plate_shape=(), log_prob_scale=1.0, observed=None):
    return _rv(D.Bernoulli(), {"probs": probs, "logits": logits}, name, plate_shape, log_prob_scale, observed)


def BinomialVariable(total_count, probs=None, name=None, logits=None, plate_shape=(), log_prob_scale=1.0, observed=None):
    return _rv(
        D.Binomial(),
        {"total_count": total_count, "probs": probs, "logits": logits},
        name, plate_shape, log_prob_scale, observed,
    )


def PoissonVariable(rate, name=None, plate_shape=(), log_prob_scale=1.0, observed=None):
    return _rv(D.Poisson(), {"rate": rate}, name, plate_shape, log_prob_scale, observed)


def GeometricVariable(probs=None, name=None, logits=None, plate_shape=(), log_prob_scale=1.0, observed=None):
    return _rv(D.Geometric(), {"probs": probs, "logits": logits}, name, plate_shape, log_prob_scale, observed)


def CategoricalVariable(probs=None, name=None, logits=None, plate_shape=(), log_prob_scale=1.0, observed=None):
    return _rv(D.Categorical(), {"probs": probs, "logits": logits}, name, plate_shape, log_prob_scale, observed)


def ConcreteVariable(temperature, logits, name=None, plate_shape=(), log_prob_scale=1.0, observed=None):
    return _rv(D.Concrete(), {"temperature": temperature, "logits": logits}, name, plate_shape, log_prob_scale, observed)


def MultivariateNormalVariable(
    loc, name=None, covariance_matrix=None, scale_tril=None,
    plate_shape=(), log_prob_scale=1.0, observed=None,
):
    return _rv(
        D.MultivariateNormal(),
        {"loc": loc, "covariance_matrix": covariance_matrix, "scale_tril": scale_tril},
        name, plate_shape, log_prob_scale, observed,
    )


def DirichletVariable(concentration, name=None, plate_shape=(), log_prob_scale=1.0, observed=None):
    return _rv(D.Dirichlet(), {"concentration": concentration}, name, plate_shape, log_prob_scale, observed)


def EmpiricalVariable(dataset, name=None, indices=None, batch_size=None):
    """Data-loader node: draws rows of ``dataset`` (SURVEY.md §2).

    With ``indices`` (a variable, typically ``RandomIndices``), returns
    ``dataset[indices]``; with ``batch_size``, draws iid-uniform rows; with
    neither, yields the full dataset each sample.
    """
    links = {"dataset": dataset}
    if indices is not None:
        links["indices"] = indices
    return RandomVariable(D.Empirical(batch_size=batch_size), name=name, links=links)


def RandomIndices(dataset_size, batch_size, name=None):
    """Minibatch index sampler (reference's RandomIndices, SURVEY.md §2)."""
    return RandomVariable(D.RandomIndices(dataset_size, batch_size), name=name, links={})


def NonCenteredNormalVariable(loc, scale, name=None, shape=None,
                              plate_shape=(), raw_name=None):
    """Non-centered Normal hierarchy (reparameterization utility).

    Builds ``raw ~ N(0, 1)`` as the sampled latent and returns the
    deterministic node ``name = loc + scale * raw``.  HMC/NUTS then
    samples the well-conditioned standard-normal ``raw`` instead of the
    funnel-shaped centered coordinate — the classic fix when ``scale`` is
    itself a random hierarchy scale (Neal's funnel / eight-schools / ARD
    geometries, where centered NUTS diverges in the neck at any step
    size).  The returned node appears in ``sample()`` outputs via
    ``collect_deterministic``; pass ``ess_vars=[name, ...]`` to get its
    ESS/R-hat directly.

    ``shape``: event shape of the standard-normal latent.  Inferred by
    broadcasting concrete ``loc``/``scale`` arrays when omitted; required
    when both are Variables/expressions.  The latent is exposed as the
    ``.raw`` attribute (named ``raw_name`` or ``f"{name}_raw"``).
    """
    import numpy as np

    from .variables import PartialLink, Variable

    if shape is None:
        symbolic = [
            isinstance(a, (Variable, PartialLink)) for a in (loc, scale)
        ]
        shapes = [
            np.shape(a) for a, sym in zip((loc, scale), symbolic) if not sym
        ]
        if not shapes:
            raise ValueError(
                "NonCenteredNormalVariable: pass shape= when both loc and "
                "scale are variables/expressions"
            )
        shape = np.broadcast_shapes(*shapes)
        if any(symbolic) and shape == ():
            # ADVICE r4 #1: the DSL carries no shapes before compile, so a
            # symbolic operand (e.g. a vector hierarchy scale tau) cannot
            # contribute here — inferring () from the remaining scalars
            # would silently build ONE shared raw draw broadcast across
            # every component of the symbolic operand: a different joint
            # distribution than the per-component hierarchy the user
            # almost certainly intended.  Require the shape explicitly.
            raise ValueError(
                "NonCenteredNormalVariable: loc/scale includes a variable/"
                "expression whose shape is unknown at model-build time and "
                "the concrete operands are all scalar — pass shape= "
                "explicitly (shape=() if a single shared raw draw is "
                "really intended)"
            )
    shape = tuple(shape)
    raw = NormalVariable(
        np.zeros(shape, np.float32), np.ones(shape, np.float32),
        name=raw_name or (f"{name}_raw" if name else None),
        plate_shape=plate_shape,
    )
    out = DeterministicVariable(loc + scale * raw, name=name)
    out.raw = raw
    return out


def MixtureVariable(component_dist, probs=None, name=None, logits=None,
                    plate_shape=(), log_prob_scale=1.0, observed=None,
                    **component_params):
    """Marginalized finite mixture (HMC/NUTS-compatible — no discrete
    assignment latent).  Component params carry a leading K axis::

        x = MixtureVariable(D.Normal(), probs=[0.3, 0.7],
                            loc=mus, scale=sigs, name="x")
    """
    links = {"probs": probs, "logits": logits, **component_params}
    return _rv(D.Mixture(component_dist), links, name, plate_shape,
               log_prob_scale, observed)
