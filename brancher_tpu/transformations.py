"""Invertible transformations / normalizing flows for variational models.

Reference parity: Brancher's ``transformations.py`` — ``PlanarFlow``,
``TriangularLinear``, ``Sigmoid`` composable into variational models
(SURVEY.md §2 "Transformations / flows", L6).

TPU-first design: a flow-transformed variable is ONE RandomVariable whose
distribution kernel fuses base sampling + flow forward + log-density
accumulation in a single traced function (``sample_and_log_prob``), so
the whole reparameterized path is differentiable and XLA-fused.  Flows
that lack an analytic inverse (PlanarFlow) still work as variational
families because the guide only ever needs the sampling-direction density;
``log_prob`` of arbitrary values is provided when every flow in the stack
is invertible (TriangularLinear, Sigmoid).

Learnable flow parameters are auto-registered as learnable
DeterministicVariables, so they train through the ordinary optax path.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .distributions import Distribution, Normal, REAL
from .variables import DeterministicVariable, RandomVariable

Array = jax.Array


class Flow:
    """One invertible map R^d -> R^d with learnable parameters."""

    invertible = True

    def param_inits(self, dim: int) -> Dict[str, Array]:
        return {}

    def forward_and_log_det(self, z: Array, params: Dict[str, Array]) -> Tuple[Array, Array]:
        raise NotImplementedError

    def inverse(self, x: Array, params: Dict[str, Array]) -> Array:
        raise NotImplementedError


class PlanarFlow(Flow):
    """f(z) = z + u * tanh(w.z + b)  (Rezende & Mohamed).  No analytic
    inverse — sampling-direction use only."""

    invertible = False

    def param_inits(self, dim: int) -> Dict[str, Array]:
        rng = np.random.RandomState(0)
        return {
            "u": jnp.asarray(0.1 * rng.normal(size=dim), jnp.float32),
            "w": jnp.asarray(0.1 * rng.normal(size=dim), jnp.float32),
            "b": jnp.zeros((), jnp.float32),
        }

    def _u_hat(self, u, w):
        # enforce invertibility: w.u >= -1
        wu = jnp.dot(w, u)
        m = -1.0 + jax.nn.softplus(wu)
        return u + (m - wu) * w / (jnp.dot(w, w) + 1e-8)

    def forward_and_log_det(self, z, params):
        u, w, b = params["u"], params["w"], params["b"]
        u = self._u_hat(u, w)
        a = jnp.dot(w, z) + b
        f = z + u * jnp.tanh(a)
        psi = (1.0 - jnp.tanh(a) ** 2) * w
        logdet = jnp.log(jnp.abs(1.0 + jnp.dot(u, psi)) + 1e-8)
        return f, logdet


class TriangularLinear(Flow):
    """f(z) = L z with lower-triangular L (positive diagonal)."""

    invertible = True

    def param_inits(self, dim: int) -> Dict[str, Array]:
        return {
            "log_diag": jnp.zeros((dim,), jnp.float32),
            "tril": jnp.zeros((dim, dim), jnp.float32),
        }

    def _matrix(self, params):
        return jnp.tril(params["tril"], -1) + jnp.diag(jnp.exp(params["log_diag"]))

    def forward_and_log_det(self, z, params):
        L = self._matrix(params)
        return L @ z, jnp.sum(params["log_diag"])

    def inverse(self, x, params):
        L = self._matrix(params)
        return jax.scipy.linalg.solve_triangular(L, x, lower=True)


class Sigmoid(Flow):
    """Elementwise logistic squashing onto (0,1)^d."""

    invertible = True

    def forward_and_log_det(self, z, params):
        x = jax.nn.sigmoid(z)
        logdet = jnp.sum(-jax.nn.softplus(z) - jax.nn.softplus(-z))
        return x, logdet

    def inverse(self, x, params):
        return jnp.log(x) - jnp.log1p(-x)


class Shift(Flow):
    """f(z) = z + mu (learnable location)."""

    invertible = True

    def param_inits(self, dim: int) -> Dict[str, Array]:
        return {"mu": jnp.zeros((dim,), jnp.float32)}

    def forward_and_log_det(self, z, params):
        return z + params["mu"], jnp.zeros(())

    def inverse(self, x, params):
        return x - params["mu"]


class TransformedDistribution(Distribution):
    """base_dist pushed through a flow stack; density fused with sampling."""

    reparameterized = True
    support = REAL

    def __init__(self, base_dist: Distribution, flows: Sequence[Flow],
                 base_param_names: Sequence[str]):
        self.base_dist = base_dist
        self.flows = list(flows)
        self.base_param_names = tuple(base_param_names)

    def _split(self, params):
        base_p = {k: params[k] for k in self.base_param_names if k in params}
        flow_ps = []
        for i, fl in enumerate(self.flows):
            prefix = f"flow{i}_"
            flow_ps.append(
                {k[len(prefix):]: v for k, v in params.items() if k.startswith(prefix)}
            )
        return base_p, flow_ps

    def sample(self, key, **params):
        x, _ = self.sample_and_log_prob(key, **params)
        return x

    def sample_and_log_prob(self, key, **params):
        base_p, flow_ps = self._split(params)
        z = self.base_dist.sample(key, **base_p)
        lp = jnp.sum(self.base_dist.log_prob(z, **base_p))
        for fl, fp in zip(self.flows, flow_ps):
            z, ld = fl.forward_and_log_det(z, fp)
            lp = lp - ld
        return z, lp

    def log_prob(self, value, **params):
        if not all(fl.invertible for fl in self.flows):
            raise NotImplementedError(
                "flow stack contains a non-invertible flow (e.g. PlanarFlow);"
                " density is only available along the sampling path"
            )
        base_p, flow_ps = self._split(params)
        z = value
        logdet = jnp.zeros(())
        for fl, fp in reversed(list(zip(self.flows, flow_ps))):
            z = fl.inverse(z, fp)
            _, ld = fl.forward_and_log_det(z, fp)
            logdet = logdet + ld
        return jnp.sum(self.base_dist.log_prob(z, **base_p)) - logdet


def TransformedVariable(
    name: str,
    dim: int,
    flows: Sequence[Flow],
    base_dist: Optional[Distribution] = None,
    base_links: Optional[Dict] = None,
) -> RandomVariable:
    """A flow-transformed latent (learnable flow params auto-registered).

    Example — a planar-flow variational family::

        qz = TransformedVariable("z", dim=4,
                                 flows=[TriangularLinear(), Shift(), PlanarFlow()])
        q = ProbabilisticModel([qz])
    """
    if base_dist is None:
        base_dist = Normal()
        base_links = {"loc": jnp.zeros(dim), "scale": jnp.ones(dim)}
    base_links = dict(base_links or {})
    links = dict(base_links)
    for i, fl in enumerate(flows):
        for pname, init in fl.param_inits(dim).items():
            dv = DeterministicVariable(init, f"{name}__flow{i}_{pname}", learnable=True)
            links[f"flow{i}_{pname}"] = dv
    dist = TransformedDistribution(base_dist, flows, tuple(base_links.keys()))
    return RandomVariable(dist, name=name, links=links)
