"""Bijections between unconstrained space and distribution supports.

No reference counterpart: Brancher has no HMC and therefore no
unconstraining machinery (SURVEY.md §0 — NUTS/HMC are net-new per
BASELINE.json).  These bijections let every continuous latent live in R^n
for HMC/NUTS and for mean-field guides, with exact log-det-Jacobian
corrections added to the log-joint.

Convention: ``forward`` maps unconstrained -> support, ``inverse`` maps
support -> unconstrained, and ``forward_log_det`` returns the *elementwise*
log|d forward / dz| (summed by the caller); for SIMPLEX the log-det is
already reduced over the event axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import distributions as dists

Array = jax.Array


class Transform:
    def forward(self, z: Array, **kw) -> Array:
        raise NotImplementedError

    def inverse(self, x: Array, **kw) -> Array:
        raise NotImplementedError

    def forward_log_det(self, z: Array, **kw) -> Array:
        raise NotImplementedError

    # unconstrained dimensionality change (simplex drops one dim)
    def unconstrained_shape(self, constrained_shape):
        return constrained_shape


class Identity(Transform):
    def forward(self, z):
        return z

    def inverse(self, x):
        return x

    def forward_log_det(self, z):
        return jnp.zeros(jnp.shape(z))


class Exp(Transform):
    """R -> (0, inf)."""

    def forward(self, z):
        return jnp.exp(z)

    def inverse(self, x):
        return jnp.log(x)

    def forward_log_det(self, z):
        return z


class Sigmoid(Transform):
    """R -> (0, 1)."""

    def forward(self, z):
        return jax.nn.sigmoid(z)

    def inverse(self, x):
        return jnp.log(x) - jnp.log1p(-x)

    def forward_log_det(self, z):
        return -jax.nn.softplus(z) - jax.nn.softplus(-z)


class Interval(Transform):
    """R -> (low, high) via affine sigmoid.  Bounds are runtime params."""

    def __init__(self, low, high):
        self.low = low
        self.high = high

    def forward(self, z):
        return self.low + (self.high - self.low) * jax.nn.sigmoid(z)

    def inverse(self, x):
        u = (x - self.low) / (self.high - self.low)
        return jnp.log(u) - jnp.log1p(-u)

    def forward_log_det(self, z):
        return (
            jnp.log(self.high - self.low)
            - jax.nn.softplus(z)
            - jax.nn.softplus(-z)
        )


class StickBreaking(Transform):
    """R^{K-1} -> interior of the K-simplex (last axis).

    The TFP/Stan stick-breaking construction with the centering offset
    log(1/(K-k-1)) so that z=0 maps to the uniform simplex point.
    """

    def forward(self, z):
        k = z.shape[-1] + 1
        offset = -jnp.log(jnp.arange(k - 1, 0, -1, dtype=z.dtype))
        zc = z + offset
        v = jax.nn.sigmoid(zc)  # stick fractions
        one_minus = jnp.concatenate(
            [jnp.ones(z.shape[:-1] + (1,), z.dtype), jnp.cumprod(1 - v, axis=-1)],
            axis=-1,
        )
        head = v * one_minus[..., :-1]
        last = one_minus[..., -1:]
        return jnp.concatenate([head, last], axis=-1)

    def inverse(self, x):
        k = x.shape[-1]
        xc = jnp.cumsum(x[..., :-1], axis=-1)
        remainder = 1.0 - jnp.concatenate(
            [jnp.zeros(x.shape[:-1] + (1,), x.dtype), xc[..., :-1]], axis=-1
        )
        v = x[..., :-1] / remainder
        offset = -jnp.log(jnp.arange(k - 1, 0, -1, dtype=x.dtype))
        return jnp.log(v) - jnp.log1p(-v) - offset

    def forward_log_det(self, z):
        # summed over the event axis (returns shape z.shape[:-1])
        k = z.shape[-1] + 1
        offset = -jnp.log(jnp.arange(k - 1, 0, -1, dtype=z.dtype))
        zc = z + offset
        v = jax.nn.sigmoid(zc)
        one_minus = jnp.concatenate(
            [jnp.ones(z.shape[:-1] + (1,), z.dtype), jnp.cumprod(1 - v, axis=-1)],
            axis=-1,
        )
        log_sig = -jax.nn.softplus(-zc) - jax.nn.softplus(zc)  # log v(1-v)... careful
        # d x_k / d z_k = v'(z) * prod_{j<k}(1-v_j); v'(z) = v(1-v)
        log_vprime = jnp.log(v) + jnp.log1p(-v)
        return jnp.sum(log_vprime + jnp.log(one_minus[..., :-1]), axis=-1)

    def unconstrained_shape(self, constrained_shape):
        return tuple(constrained_shape[:-1]) + (constrained_shape[-1] - 1,)


def transform_for(dist: dists.Distribution, params=None) -> Transform:
    """Pick the unconstraining bijection for a distribution's support."""
    s = dist.support
    if s == dists.REAL:
        return Identity()
    if s == dists.POSITIVE:
        return Exp()
    if s == dists.UNIT_INTERVAL:
        return Sigmoid()
    if s == dists.SIMPLEX:
        return StickBreaking()
    if s == dists.INTERVAL:
        if params is None or "low" not in params or "high" not in params:
            raise ValueError("interval support needs low/high parameter values")
        return Interval(params["low"], params["high"])
    raise ValueError(f"no unconstraining transform for support {s!r}")
