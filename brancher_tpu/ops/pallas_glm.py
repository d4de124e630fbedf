"""Generalized fused GLM potentials: Pallas value+grad kernels + a
numeric pattern recognizer that upgrades ANY eligible model automatically.

Round-1 shipped one benchmark-shaped kernel (ops/pallas_logreg.py:
Gaussian-prior logistic regression, X VMEM-whole).  This module is the
generalization (VERDICT r1 "Next round" #3):

  * two families covering the reference model zoo's dense likelihoods —
      - ``bernoulli_logit``  y_n ~ Bernoulli(sigmoid(x_n·z + b_n))
      - ``normal_learned``   y_n ~ N(x_n·z + b_n, exp(u·z + c0))
        (learned log-noise: AR(p) over (coeffs, log sigma) is exactly
        this family with the lagged series as design matrix)
  * N-tiling: the design matrix streams through VMEM in row blocks via a
    (chain-block, row-block) grid with in-VMEM accumulation, so the
    dataset is NOT bounded by VMEM (the r1 kernel required [N,d] whole);
  * a RECOGNIZER (``recognize_fused_potential``) that, at sample() time,
    numerically probes the compiled model: verifies the z-space prior is
    diagonal-Gaussian, extracts the affine design of the observed
    likelihood's parameters, and self-checks the assembled fused
    potential against the autodiff log-density at random points before
    trusting it.  Any model that matches gets the fused MXU path with no
    user opt-in; everything else silently keeps vmapped autodiff.

The probes are exact, not heuristic: affinity is verified at a random
point and the final self-check compares values (up to a constant) AND
gradients, so a false positive cannot corrupt inference.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ======================================================================
# Pure-JAX reference implementations (CPU path + ground truth in tests)
# ======================================================================

def bernoulli_vg_reference(
    z: Array, x: Array, y: Array, b: Array,
    prior_mean: Array, prior_inv_var: Array, ll_scale: float = 1.0,
) -> Tuple[Array, Array]:
    """z [C,D] -> (val [C], grad [C,D]).  logits = z@x.T + b."""
    logits = z @ x.T + b[None, :]
    ll = jnp.sum(y[None, :] * logits - jax.nn.softplus(logits), axis=-1)
    dz = z - prior_mean[None, :]
    val = ll_scale * ll - 0.5 * jnp.sum(dz * dz * prior_inv_var[None, :], -1)
    resid = y[None, :] - jax.nn.sigmoid(logits)
    grad = ll_scale * (resid @ x) - dz * prior_inv_var[None, :]
    return val, grad


def bernoulli_vg_reference_bf16(
    z: Array, x16: Array, y: Array, b: Array,
    prior_mean: Array, prior_inv_var: Array, ll_scale: float = 1.0,
) -> Tuple[Array, Array]:
    """bernoulli_vg_reference with bf16 multiplies / f32 accumulates —
    the MXU-native mode.  Measured fastest at 2 of 3 MXU-bound shapes
    (93.8 and 143.2 TFLOP/s = 47.6% / 72.7% of bf16 peak; BASELINE.md
    roofline table) with ~1e-6 relative value error vs f32.  ``x16`` is
    the PRE-CAST bf16 design matrix (cast once at build time, not per
    call — a per-call cast would stream the full matrix through HBM
    twice)."""
    z16 = z.astype(jnp.bfloat16)
    logits = jnp.dot(z16, x16.T, preferred_element_type=jnp.float32) + b[None, :]
    ll = jnp.sum(y[None, :] * logits - jax.nn.softplus(logits), axis=-1)
    dz = z - prior_mean[None, :]
    val = ll_scale * ll - 0.5 * jnp.sum(dz * dz * prior_inv_var[None, :], -1)
    resid = (y[None, :] - jax.nn.sigmoid(logits)).astype(jnp.bfloat16)
    grad = ll_scale * jnp.dot(
        resid, x16, preferred_element_type=jnp.float32
    ) - dz * prior_inv_var[None, :]
    return val, grad


def normal_vg_reference_bf16(
    z: Array, x16: Array, y: Array, b: Array, u: Array, c0: float,
    prior_mean: Array, prior_inv_var: Array, ll_scale: float = 1.0,
) -> Tuple[Array, Array]:
    """normal_vg_reference with bf16 multiplies / f32 accumulates (see
    bernoulli_vg_reference_bf16; ``u`` is [D]-small and stays f32)."""
    n = y.shape[0]
    z16 = z.astype(jnp.bfloat16)
    loc = jnp.dot(z16, x16.T, preferred_element_type=jnp.float32) + b[None, :]
    resid = y[None, :] - loc  # [C, N] f32
    s = z @ u + c0  # [C]
    e2 = jnp.exp(-2.0 * s)
    rss = jnp.sum(resid * resid, -1)
    dz = z - prior_mean[None, :]
    val = ll_scale * (-0.5 * e2 * rss - n * s) - 0.5 * jnp.sum(
        dz * dz * prior_inv_var[None, :], -1
    )
    g_loc = e2[:, None] * jnp.dot(
        resid.astype(jnp.bfloat16), x16, preferred_element_type=jnp.float32
    )
    g_s = e2 * rss - n
    grad = ll_scale * (g_loc + g_s[:, None] * u[None, :]) - dz * prior_inv_var[None, :]
    return val, grad


def normal_vg_reference(
    z: Array, x: Array, y: Array, b: Array, u: Array, c0: float,
    prior_mean: Array, prior_inv_var: Array, ll_scale: float = 1.0,
) -> Tuple[Array, Array]:
    """z [C,D] -> (val [C], grad [C,D]).

    resid = y - (z@x.T + b); log-noise s = z@u + c0;
    ll = -0.5 e^{-2s} ||resid||^2 - N s   (+ const).
    """
    n = y.shape[0]
    resid = y[None, :] - (z @ x.T + b[None, :])  # [C, N]
    s = z @ u + c0  # [C]
    e2 = jnp.exp(-2.0 * s)  # [C]
    rss = jnp.sum(resid * resid, -1)  # [C]
    dz = z - prior_mean[None, :]
    val = ll_scale * (-0.5 * e2 * rss - n * s) - 0.5 * jnp.sum(
        dz * dz * prior_inv_var[None, :], -1
    )
    g_loc = e2[:, None] * (resid @ x)  # [C, D]
    g_s = e2 * rss - n  # [C]
    grad = ll_scale * (g_loc + g_s[:, None] * u[None, :]) - dz * prior_inv_var[None, :]
    return val, grad


# Jitted wrappers with the data arrays as ARGUMENTS (see
# FusedFamily.value_and_grad for why: eager dispatch must stay fused —
# OOM/10x measured otherwise — and closure constants overflow the
# remote compile service's payload limit at MXU scale).
_jit_bernoulli_vg = jax.jit(bernoulli_vg_reference)
_jit_bernoulli_vg_bf16 = jax.jit(bernoulli_vg_reference_bf16)
_jit_normal_vg = jax.jit(normal_vg_reference)
_jit_normal_vg_bf16 = jax.jit(normal_vg_reference_bf16)


def categorical_vg_reference(
    z: Array, x: Array, y_onehot: Array, c: Array, cols: Array, ks: Array,
    prior_mean: Array, prior_inv_var: Array, ll_scale: float = 1.0,
) -> Tuple[Array, Array]:
    """Structure-preserving softmax potential: z [C,D] -> (val [C], grad [C,D]).

    The recognizer (ROADMAP r2 #9) maps each flat latent coordinate j to
    one (feature, class) cell (cols[j], ks[j]) of an effective weight
    matrix W [m,K], with design x [N,m] and logit offset c [N,K]:
        logits = x @ W(z) + c,  W(z)[cols[j], ks[j]] += z_j.
    This is the batched-3D-matmul layout — O(C·N·K·m) MXU FLOPs instead
    of the O(C·N·K·D)=O(C·N·K²·m) an affine-flattened design would cost.
    """
    ch, d = z.shape
    m = x.shape[1]
    k = y_onehot.shape[1]
    w = jnp.zeros((ch, m, k), z.dtype).at[:, cols, ks].add(z)  # [C,m,K]
    logits = jnp.einsum("nm,cmk->cnk", x, w) + c[None]  # [C,N,K]
    ll = jnp.sum(
        jnp.sum(y_onehot[None] * logits, -1) - jax.nn.logsumexp(logits, -1),
        axis=-1,
    )
    dz = z - prior_mean[None, :]
    val = ll_scale * ll - 0.5 * jnp.sum(dz * dz * prior_inv_var[None, :], -1)
    resid = y_onehot[None] - jax.nn.softmax(logits, axis=-1)  # [C,N,K]
    gw = jnp.einsum("nm,cnk->cmk", x, resid)  # [C,m,K]
    grad = ll_scale * gw[:, cols, ks] - dz * prior_inv_var[None, :]
    return val, grad


# ======================================================================
# Pallas kernels (TPU): (chain-block, row-block) grid, VMEM accumulation
# ======================================================================

def _bern_kernel(z_ref, x_ref, y_ref, b_ref, m_ref, iv_ref, val_ref, grad_ref,
                 *, ll_scale: float):
    j = jax.lax.convert_element_type(0, jnp.int32) + _pid1()
    z = z_ref[:]  # [BC, D]
    x = x_ref[:]  # [BN, D]
    y = y_ref[:]  # [1, BN]  (pre-masked: padded rows contribute 0 — see pad)
    b = b_ref[:]  # [2, BN]  row 0 = offset, row 1 = mask
    logits = jax.lax.dot_general(
        z, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + b[0:1, :]  # [BC, BN]
    mask = b[1:2, :]
    ll = jnp.sum(
        (y * logits - jax.nn.softplus(logits)) * mask, axis=-1, keepdims=True
    )
    resid = (y - jax.nn.sigmoid(logits)) * mask

    @_when(j == 0)
    def _():
        dz = z - m_ref[:]
        val_ref[:] = -0.5 * jnp.sum(dz * dz * iv_ref[:], -1, keepdims=True)
        grad_ref[:] = -dz * iv_ref[:]

    val_ref[:] += ll_scale * ll
    grad_ref[:] += ll_scale * jax.lax.dot_general(
        resid, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _normal_kernel(z_ref, x_ref, y_ref, b_ref, m_ref, iv_ref, u_ref,
                   val_ref, grad_ref, *, ll_scale: float, c0: float,
                   n_real: int, n_blocks: int):
    j = jax.lax.convert_element_type(0, jnp.int32) + _pid1()
    z = z_ref[:]  # [BC, D]
    x = x_ref[:]  # [BN, D]
    y = y_ref[:]  # [1, BN]
    b = b_ref[:]  # [2, BN] (offset / mask; padded rows of x,y,b are 0)
    u = u_ref[:]  # [1, D]
    s = jnp.sum(z * u, -1, keepdims=True) + c0  # [BC, 1]
    e2 = jnp.exp(-2.0 * s)
    loc = jax.lax.dot_general(
        z, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + b[0:1, :]
    resid = (y - loc) * b[1:2, :]  # [BC, BN]
    rss = jnp.sum(resid * resid, -1, keepdims=True)  # [BC, 1]

    @_when(j == 0)
    def _():
        dz = z - m_ref[:]
        val_ref[:] = (
            -0.5 * jnp.sum(dz * dz * iv_ref[:], -1, keepdims=True)
            - ll_scale * n_real * s
        )
        grad_ref[:] = -dz * iv_ref[:] - (ll_scale * n_real) * u

    val_ref[:] += ll_scale * (-0.5) * e2 * rss
    g_loc = e2 * jax.lax.dot_general(
        resid, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    grad_ref[:] += ll_scale * (g_loc + (e2 * rss) * u)


def _bern_kernel_bf16(z_ref, x_ref, y_ref, b_ref, m_ref, iv_ref, val_ref,
                      grad_ref, *, ll_scale: float):
    """bf16-multiply / f32-accumulate variant of _bern_kernel (VERDICT r4
    missing #1 / ROADMAP #12): x_ref holds the PRE-CAST bf16 design
    block; z and the residual are cast to bf16 at the MXU input, both
    dot_generals accumulate in f32 (preferred_element_type), and all VPU
    math (softplus/sigmoid/prior) plus the val/grad accumulators stay
    f32.  Combines the bf16 MXU rate with the kernel's fusion/no-pjit-
    boundary structure — the two advantages BASELINE.md's round-4
    roofline table showed were never combined."""
    j = jax.lax.convert_element_type(0, jnp.int32) + _pid1()
    z = z_ref[:]  # [BC, D] f32
    z16 = z.astype(jnp.bfloat16)
    x16 = x_ref[:]  # [BN, D] bf16
    y = y_ref[:]  # [1, BN]
    b = b_ref[:]  # [2, BN]  row 0 = offset, row 1 = mask
    logits = jax.lax.dot_general(
        z16, x16, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + b[0:1, :]  # [BC, BN] f32
    mask = b[1:2, :]
    ll = jnp.sum(
        (y * logits - jax.nn.softplus(logits)) * mask, axis=-1, keepdims=True
    )
    resid16 = ((y - jax.nn.sigmoid(logits)) * mask).astype(jnp.bfloat16)

    @_when(j == 0)
    def _():
        dz = z - m_ref[:]
        val_ref[:] = -0.5 * jnp.sum(dz * dz * iv_ref[:], -1, keepdims=True)
        grad_ref[:] = -dz * iv_ref[:]

    val_ref[:] += ll_scale * ll
    grad_ref[:] += ll_scale * jax.lax.dot_general(
        resid16, x16, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _normal_kernel_bf16(z_ref, x_ref, y_ref, b_ref, m_ref, iv_ref, u_ref,
                        val_ref, grad_ref, *, ll_scale: float, c0: float,
                        n_real: int, n_blocks: int):
    """bf16-multiply / f32-accumulate variant of _normal_kernel (see
    _bern_kernel_bf16).  The log-noise projection u·z is [D]-small VPU
    work and stays f32."""
    j = jax.lax.convert_element_type(0, jnp.int32) + _pid1()
    z = z_ref[:]  # [BC, D] f32
    z16 = z.astype(jnp.bfloat16)
    x16 = x_ref[:]  # [BN, D] bf16
    y = y_ref[:]
    b = b_ref[:]
    u = u_ref[:]  # [1, D] f32
    s = jnp.sum(z * u, -1, keepdims=True) + c0  # [BC, 1]
    e2 = jnp.exp(-2.0 * s)
    loc = jax.lax.dot_general(
        z16, x16, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + b[0:1, :]
    resid = (y - loc) * b[1:2, :]  # [BC, BN] f32
    rss = jnp.sum(resid * resid, -1, keepdims=True)

    @_when(j == 0)
    def _():
        dz = z - m_ref[:]
        val_ref[:] = (
            -0.5 * jnp.sum(dz * dz * iv_ref[:], -1, keepdims=True)
            - ll_scale * n_real * s
        )
        grad_ref[:] = -dz * iv_ref[:] - (ll_scale * n_real) * u

    val_ref[:] += ll_scale * (-0.5) * e2 * rss
    g_loc = e2 * jax.lax.dot_general(
        resid.astype(jnp.bfloat16), x16, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    grad_ref[:] += ll_scale * (g_loc + (e2 * rss) * u)


def _pid1():
    from jax.experimental import pallas as pl

    return pl.program_id(1)


def _when(cond):
    from jax.experimental import pallas as pl

    return pl.when(cond)


def _glm_pallas_call(kernel, z, x, y, b_and_mask, prior_mean, prior_inv_var,
                     extra_vmem, out_dtype, block_chains=256, block_rows=1024,
                     interpret=False, cost=None):
    """Shared launch: grid (chain blocks, row blocks), accumulate into
    val/grad which stay VMEM-resident across the row sweep (row index is
    the fastest grid dimension)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c, d = z.shape
    n_pad = x.shape[0]
    bc = min(block_chains, _round_up(c, 8))
    bn = min(block_rows, n_pad)
    c_pad = _round_up(c, bc)
    if c_pad != c:
        z = jnp.pad(z, ((0, c_pad - c), (0, 0)))
    grid = (c_pad // bc, n_pad // bn)

    in_specs = [
        pl.BlockSpec((bc, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [z, x, y, b_and_mask, prior_mean, prior_inv_var]
    for e in extra_vmem:
        in_specs.append(
            pl.BlockSpec(e.shape, lambda i, j: tuple(0 for _ in e.shape),
                         memory_space=pltpu.VMEM)
        )
        args.append(e)

    val, grad = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bc, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c_pad, 1), out_dtype),
            jax.ShapeDtypeStruct((c_pad, d), out_dtype),
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(*args)
    return val[:c, 0], grad[:c]


def _auto_blocks(d: int, block_chains, block_rows, x_bytes: int = 4,
                 bn_start: int = 1024):
    """Vmem-safe block defaults.  The double-buffered z/x input blocks
    plus the VMEM-resident val/grad accumulators must fit the ~16 MB
    scoped-vmem stack: 256x1024 blocks at d=1024 request 18.24 MB and
    fail to compile (measured 2026-08-20).  Explicit caller values are
    honored unchanged; None means auto (start 256 x bn_start, shrink to
    fit).  ``x_bytes`` is the design-block element size (2 for the bf16
    kernels, whose x blocks cost half the VMEM — letting the auto path
    keep bigger row blocks at the same budget)."""
    bc = 256 if block_chains is None else block_chains
    bn = bn_start if block_rows is None else block_rows
    # shrink over whichever dimension(s) the caller left as auto (ADVICE
    # r3 #3: requiring BOTH to be None let a single explicit arg reach
    # the 18 MB scoped-vmem compile failure the docstring documents)
    bc_auto, bn_auto = block_chains is None, block_rows is None
    if bc_auto or bn_auto:
        def est(bc, bn):  # bytes: 2x-buffered inputs + out val/grad
            return 2 * (bc * d * 4 + bn * d * x_bytes) + 2 * bc * d * 4
        while est(bc, bn) > 10 * 2**20 and (
            (bc_auto and bc > 8) or (bn_auto and bn > 256)
        ):
            if bn_auto and bn >= 2 * bc and bn > 256:
                bn //= 2
            elif bc_auto and bc > 8:
                bc //= 2
            elif bn_auto:
                bn //= 2
            else:
                bc //= 2
    return bc, bn


def build_glm_vg_pallas(family, x, y, b, prior_mean, prior_inv_var,
                        u=None, c0=0.0, ll_scale=1.0, dtype="f32",
                        block_chains=None, block_rows=None, interpret=False):
    """Build fn(z [C,D]) -> (val [C], grad [C,D]) with data prep done
    ONCE: row padding, mask assembly, and (for dtype='bf16') the design-
    matrix cast all happen at build time, not per call.  Per-call prep
    is free under an outer jit but NOT under eager dispatch
    (sample(jit_runner=False)) — there a per-call jnp.pad of an
    MXU-scale X re-streams the full matrix through HBM on every
    gradient evaluation, a measurable tax on exactly the payload-
    limited path the kernel serves.

    dtype='bf16' routes to the bf16-multiply/f32-accumulate kernels
    (VERDICT r4 missing #1): pre-cast bf16 X blocks (half the VMEM, so
    auto-blocking keeps 2048-row blocks where f32 fits 1024), bf16 MXU
    inputs, f32 accumulators and VPU math."""
    from jax.experimental import pallas as pl

    n, d = x.shape
    bf16 = dtype == "bf16"
    block_chains, block_rows = _auto_blocks(
        d, block_chains, block_rows,
        x_bytes=2 if bf16 else 4, bn_start=2048 if bf16 else 1024,
    )
    bn = min(block_rows, _round_up(n, 256))
    n_pad = _round_up(n, bn)
    mask = jnp.concatenate([jnp.ones((n,), jnp.float32),
                            jnp.zeros((n_pad - n,), jnp.float32)])
    xp = jnp.asarray(x, jnp.float32)
    if n_pad != n:  # already-aligned MXU-scale X must not be copied
        xp = jnp.pad(xp, ((0, n_pad - n), (0, 0)))
    if bf16:
        xp = xp.astype(jnp.bfloat16)
    yp = jnp.pad(jnp.asarray(y, jnp.float32), (0, n_pad - n)).reshape(1, n_pad)
    bm = jnp.stack([jnp.pad(jnp.asarray(b, jnp.float32), (0, n_pad - n)), mask])
    m2 = prior_mean.reshape(1, d)
    iv2 = prior_inv_var.reshape(1, d)
    if family == "bernoulli_logit":
        kern = functools.partial(
            _bern_kernel_bf16 if bf16 else _bern_kernel,
            ll_scale=float(ll_scale),
        )
        extra = []
        transc_per_cn = 2  # softplus + sigmoid per (chain, row)
    elif family == "normal_learned":
        kern = functools.partial(
            _normal_kernel_bf16 if bf16 else _normal_kernel,
            ll_scale=float(ll_scale), c0=float(c0), n_real=int(n),
            n_blocks=n_pad // bn,
        )
        extra = [u.reshape(1, d)]
        transc_per_cn = 0
    else:
        raise ValueError(f"unknown GLM family {family!r}")

    def vg(z):
        c = z.shape[0]
        cost = pl.CostEstimate(
            flops=4 * c * n_pad * d,
            transcendentals=transc_per_cn * c * n_pad + 2 * c,
            bytes_accessed=(c * d * 2 + 3 * n_pad + c) * 4
            + n_pad * d * (2 if bf16 else 4),
        )
        return _glm_pallas_call(
            kern, z, xp, yp, bm, m2, iv2, extra, jnp.float32,
            block_chains, bn, interpret, cost,
        )

    return vg


def bernoulli_vg_pallas(z, x, y, b, prior_mean, prior_inv_var,
                        ll_scale=1.0, block_chains=None, block_rows=None,
                        interpret=False, dtype="f32"):
    """Pallas path of bernoulli_vg_reference (N-tiled; one-shot wrapper
    around build_glm_vg_pallas — closure-build the fn for hot loops)."""
    return build_glm_vg_pallas(
        "bernoulli_logit", x, y, b, prior_mean, prior_inv_var,
        ll_scale=ll_scale, dtype=dtype, block_chains=block_chains,
        block_rows=block_rows, interpret=interpret,
    )(z)


def normal_vg_pallas(z, x, y, b, u, c0, prior_mean, prior_inv_var,
                     ll_scale=1.0, block_chains=None, block_rows=None,
                     interpret=False, dtype="f32"):
    """Pallas path of normal_vg_reference (N-tiled; one-shot wrapper
    around build_glm_vg_pallas — closure-build the fn for hot loops)."""
    return build_glm_vg_pallas(
        "normal_learned", x, y, b, prior_mean, prior_inv_var, u=u, c0=c0,
        ll_scale=ll_scale, dtype=dtype, block_chains=block_chains,
        block_rows=block_rows, interpret=interpret,
    )(z)


# ======================================================================
# Numeric recognizer
# ======================================================================

def _affine_probe(f: Callable[[np.ndarray], np.ndarray], dim: int,
                  rtol: float = 3e-3) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Extract (X, b) with f(z) = X@z + b, verified at a random point.
    Probes are vmapped: one batched graph evaluation."""
    probes = np.concatenate(
        [np.zeros((1, dim), np.float32), np.eye(dim, dtype=np.float32)]
    )
    rng = np.random.RandomState(0)
    zr = rng.normal(0, 1, size=(1, dim)).astype(np.float32)
    outs = np.asarray(jax.jit(jax.vmap(f))(jnp.asarray(np.concatenate([probes, zr]))))
    b = outs[0]
    x = (outs[1 : 1 + dim] - b[None, :]).T  # [M, D]
    pred = x @ zr[0] + b
    scale = max(float(np.max(np.abs(outs[-1]))), 1.0)
    if not np.allclose(pred, outs[-1], atol=rtol * scale):
        return None
    return x, b


def _diag_gaussian_prior(prior_f, dim: int, rtol: float = 3e-3):
    """Verify lp(z) is a diagonal quadratic; return (mean, inv_var)."""
    probes = np.concatenate([
        np.zeros((1, dim), np.float32),
        np.eye(dim, dtype=np.float32),
        -np.eye(dim, dtype=np.float32),
    ])
    rng = np.random.RandomState(1)
    zr = rng.normal(0, 1.5, size=(2, dim)).astype(np.float32)
    outs = np.asarray(jax.jit(jax.vmap(prior_f))(jnp.asarray(np.concatenate([probes, zr]))))
    lp0 = outs[0]
    lp_p = outs[1 : 1 + dim]
    lp_m = outs[1 + dim : 1 + 2 * dim]
    inv_var = -(lp_p + lp_m - 2.0 * lp0)  # curvature per coord
    if np.any(inv_var <= 0) or not np.all(np.isfinite(inv_var)):
        return None
    # lp(e_i) - lp(0) = -(1 - 2 m_i) inv_var_i / 2
    mean = (2.0 * (lp_p - lp0) / inv_var + 1.0) / 2.0
    # direct check: quadratic form reproduces lp at the random points
    for i, z in enumerate(zr):
        pred = lp0 - 0.5 * float(np.sum((z - mean) ** 2 * inv_var)) + 0.5 * float(
            np.sum(mean**2 * inv_var)
        )
        if not np.isclose(pred, outs[1 + 2 * dim + i],
                          atol=rtol * max(abs(pred), 1.0)):
            return None
    return mean.astype(np.float32), inv_var.astype(np.float32)


class FusedFamily(NamedTuple):
    """Extracted GLM structure, verified against the autodiff density."""

    family: str  # "bernoulli_logit" | "normal_learned"
    x: Array
    y: Array
    b: Array
    u: Optional[Array]
    c0: float
    prior_mean: Array
    prior_inv_var: Array
    ll_scale: float

    def value_and_grad(self, use_pallas: str = "auto", interpret: bool = False,
                       dtype: str = "f32"):
        """Batched fused potential fn(z [C,D]) -> (val [C], grad [C,D]).

        dtype="bf16" uses bf16 multiplies with f32 accumulates on a
        PRE-CAST design matrix — the MXU-native mode, measured fastest
        at 2 of 3 MXU-bound shapes (BASELINE.md roofline table; ~1e-6
        relative value error).  Opt-in because it samples a (very
        slightly) perturbed density; exposed as
        ``sample(..., fused_potential="bf16")``.

        use_pallas="auto" is SHAPE-aware (measured both ends):
          * small d — fused XLA wins end-to-end inside the samplers
            (round 2, retrace-free: logreg d=32 0.29 s vs 0.43 s; AR d=2
            0.13 s vs 0.21 s) — the custom-call launch path costs more
            than XLA's fused matmuls save;
          * MXU-bound d — XLA's f32 dot strategy is wildly
            shape-dependent (d=1024: 0.28 / 4.2 / 129 TFLOP/s across
            C,N combinations) while the N-tiled kernel sustains a
            consistent 65-83 TFLOP/s ≈ the 3-pass f32 MXU rate: the
            kernel wins 233x at (C=1024, N=1.3e5) and 15.7x at (C=256,
            N=1e6), and loses only 1.55x at (C=1024, N=1e6) where XLA
            happens to pick a fast strategy
            (scripts/exp_mxu_roofline.py, 2026-08-20; BASELINE.md
            roofline table).  The crossover sweep at N=131072 shows the
            kernel winning at EVERY d in {128, 256, 512} (40x/15.7x/
            13.3x) — XLA f32's small-shape win exists only in the
            small-N latency regime (d=32 at N=1000).
        Auto therefore keys on BOTH dims: the kernel at d >= 512
        (robust at any N), or d >= 128 with N >= 16384; the bench-class
        small models stay on the measured-faster fused XLA path.  Pass
        use_pallas=True/False to force either path (the kernel stays
        bit-checked against the reference in tests)."""
        if use_pallas == "auto":
            n, d = self.x.shape
            use_pallas = (jax.default_backend() == "tpu"
                          and (d >= 512 or (d >= 128 and n >= 16384)))
        f = self
        # The reference (XLA) paths are wrapped in their own jax.jit
        # with the data arrays as ARGUMENTS (not closure constants):
        #  * dispatched eagerly (sample(jit_runner=False), adaptation
        #    probes) the ops would otherwise run unfused, materializing
        #    [C, N] intermediates through HBM — measured OOM at
        #    C=1024 x N=1e6 (4.3 GB logits + 4.3 GB resid) and ~10x
        #    slowdown at C=256;
        #  * as arguments the arrays stay runtime buffers, so the
        #    remote compile service's payload limit (HTTP 413 at
        #    ~500 MB, CLAUDE.md round 4) is never hit.
        # Inside an outer jit these wrappers just inline.
        if dtype == "bf16":
            if f.family not in ("bernoulli_logit", "normal_learned"):
                # ADVICE r3 #1: without this, an unsupported family would
                # fall into normal_vg_reference_bf16 and crash opaquely
                # (z @ None) instead of stating the capability boundary
                raise ValueError(
                    "dtype='bf16' supports the bernoulli_logit and "
                    f"normal_learned families, not {f.family!r}"
                )
            if use_pallas:
                # the bf16 N-TILED kernel (VERDICT r4 missing #1): bf16
                # MXU rate AND the no-pjit-boundary kernel structure
                return build_glm_vg_pallas(
                    f.family, f.x, f.y, f.b, f.prior_mean,
                    f.prior_inv_var, u=f.u, c0=f.c0, ll_scale=f.ll_scale,
                    dtype="bf16", interpret=interpret,
                )
            x16 = f.x.astype(jnp.bfloat16)  # cast ONCE, outside the closure
            if f.family == "bernoulli_logit":
                return lambda z: _jit_bernoulli_vg_bf16(
                    z, x16, f.y, f.b, f.prior_mean, f.prior_inv_var,
                    f.ll_scale)
            return lambda z: _jit_normal_vg_bf16(
                z, x16, f.y, f.b, f.u, f.c0, f.prior_mean,
                f.prior_inv_var, f.ll_scale)
        if use_pallas:
            return build_glm_vg_pallas(
                f.family, f.x, f.y, f.b, f.prior_mean, f.prior_inv_var,
                u=f.u, c0=f.c0, ll_scale=f.ll_scale, dtype="f32",
                interpret=interpret,
            )
        if f.family == "bernoulli_logit":
            return lambda z: _jit_bernoulli_vg(
                z, f.x, f.y, f.b, f.prior_mean, f.prior_inv_var, f.ll_scale)
        return lambda z: _jit_normal_vg(
            z, f.x, f.y, f.b, f.u, f.c0, f.prior_mean, f.prior_inv_var,
            f.ll_scale)

    def leapfrog(self, use_pallas: str = "auto", interpret: bool = False):
        """Fused multi-step leapfrog, or an XLA loop fallback with the
        same signature (ops/pallas_leapfrog.py)."""
        from .pallas_leapfrog import build_fused_leapfrog, reference_leapfrog

        if use_pallas == "auto":
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas:
            lf = build_fused_leapfrog(
                self.family, self.x, self.y, self.b, self.prior_mean,
                self.prior_inv_var, u=self.u, c0=self.c0,
                ll_scale=self.ll_scale, interpret=interpret,
            )
            if lf is not None:
                return lf
        return reference_leapfrog(self.value_and_grad(use_pallas=use_pallas,
                                                      interpret=interpret))


class CategoricalFusedFamily(NamedTuple):
    """Extracted softmax-GLM structure (ROADMAP r2 #9): logits =
    x @ W(z) + c with each latent coordinate scattered into one
    (feature, class) cell.

    NOT auto-upgraded: measured on the axon chip (N=2000 d=32 K=10,
    256 chains, scripts/exp_categorical_speedup.py), XLA autodiff of the
    DSL's own `matmul(x, w)` already emits the structure-preserving
    batched matmuls — 0.648 ms/eval vs this family's 0.668 ms (the
    per-eval scatter costs more than it saves), 6.4 s vs 8.1 s NUTS
    sampler end-to-end.  The family stays available (verified against
    autodiff by the recognizer) for models whose DSL graph OBSCURES the
    matmul structure — per-class stacked links, elementwise-assembled
    logits — where autodiff cannot recover one big batched matmul."""

    auto_upgradable = False  # class attr, not a field

    x: Array  # [N, m] effective design
    y_onehot: Array  # [N, K]
    c: Array  # [N, K] logit offsets
    cols: Array  # [D] feature index per latent coordinate
    ks: Array  # [D] class index per latent coordinate
    prior_mean: Array
    prior_inv_var: Array
    ll_scale: float

    def value_and_grad(self, use_pallas: str = "auto", interpret: bool = False):
        f = self
        return lambda z: categorical_vg_reference(
            z, f.x, f.y_onehot, f.c, f.cols, f.ks, f.prior_mean,
            f.prior_inv_var, f.ll_scale)

    def leapfrog(self, use_pallas: str = "auto", interpret: bool = False):
        from .pallas_leapfrog import reference_leapfrog

        return reference_leapfrog(self.value_and_grad())


def _extract_categorical(a_mat, b_vec, y_int, n, num_classes, dim,
                         prior_mean, prior_inv_var, ll_scale):
    """Detect the Kronecker (feature x class) structure of the affine
    logit map A [N*K, D] and build a CategoricalFusedFamily, or None."""
    a3 = a_mat.reshape(n, num_classes, dim)
    tol = 1e-5 * max(float(np.abs(a3).max()), 1.0)
    patterns: list = []
    cols = np.zeros(dim, np.int32)
    ks_arr = np.zeros(dim, np.int32)
    for j in range(dim):
        aj = a3[:, :, j]  # [N, K]
        nz = np.nonzero(np.abs(aj).max(axis=0) > tol)[0]
        if len(nz) == 0:
            v = np.zeros(n, np.float32)
            k_j = 0
        elif len(nz) == 1:
            k_j = int(nz[0])
            v = aj[:, k_j].astype(np.float32)
        else:
            return None  # coordinate feeds several classes: not Kronecker
        for mi, pv in enumerate(patterns):
            if np.allclose(v, pv, atol=tol):
                col = mi
                break
        else:
            patterns.append(v)
            col = len(patterns) - 1
        cols[j] = col
        ks_arr[j] = k_j
    x_eff = np.stack(patterns, axis=1)  # [N, m]
    y_onehot = np.eye(num_classes, dtype=np.float32)[y_int]
    return CategoricalFusedFamily(
        jnp.asarray(x_eff), jnp.asarray(y_onehot),
        jnp.asarray(b_vec.reshape(n, num_classes).astype(np.float32)),
        jnp.asarray(cols), jnp.asarray(ks_arr),
        prior_mean, prior_inv_var, ll_scale,
    )


def recognize_fused_potential(comp, params, given=None,
                              use_pallas: str = "auto",
                              interpret: bool = False):
    """Fused batched value_and_grad for `comp`'s potential, or None."""
    fam = recognize_fused_family(comp, params, given)
    if fam is None:
        return None
    return fam.value_and_grad(use_pallas=use_pallas, interpret=interpret)


def recognize_fused_family(comp, params, given=None) -> Optional["FusedFamily"]:
    """Numerically extract the GLM structure of `comp`'s potential.

    Returns a verified FusedFamily matching comp.log_density_z up to an
    additive constant, or None.  All structure is extracted by numeric
    probing and double-checked against the autodiff density (values up
    to constant + gradients) before the fused path is trusted.
    """
    given = given or {}
    try:
        # Probe on the CPU backend: these are dozens of tiny programs, and
        # on the axon TPU backend each small jit compile costs seconds
        # (measured: 69 s for the whole probe sequence on-TPU vs <1 s on
        # CPU).  The extracted design matrices transfer to the TPU once,
        # on first use.
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            return _recognize_on_default_device(comp, params, given)
    except Exception:
        return None


def _recognize_on_default_device(comp, params, given):
    try:
        if comp.discrete_latent_names and not all(
            n in given for n in comp.discrete_latent_names
        ):
            return None
        if len(comp.observed_names) != 1:
            return None
        obs_name = comp.observed_names[0]
        obs_var = next(v for v in comp.order if v.name == obs_name)
        from ..variables import PartialLink

        if isinstance(obs_var._observed, PartialLink):
            return None  # data-loader observation: data is not constant
        from ..distributions import Bernoulli, Categorical, Normal
        from ..stochastic_processes import AutoRegressive

        z_template = comp.z_example()
        z0_flat, unravel = jax.flatten_util.ravel_pytree(z_template)
        dim = int(z0_flat.shape[0])
        if dim == 0 or dim > 4096:
            return None

        def prior_f(zf):
            return comp.log_density_z_parts(params, unravel(zf), given)[0]

        pr = _diag_gaussian_prior(jax.jit(prior_f), dim)
        if pr is None:
            return None
        prior_mean, prior_inv_var = jnp.asarray(pr[0]), jnp.asarray(pr[1])

        def obs_params_f(zf):
            return comp.eval_observed_params(params, unravel(zf), given)[obs_name]

        dist = obs_var.distribution
        ll_scale = float(obs_var.log_prob_scale)
        y_val = np.asarray(obs_var._observed, np.float32).ravel()

        if isinstance(dist, Bernoulli):
            if "logits" not in obs_var.links:
                return None

            def f_logits(zf):
                return jnp.broadcast_to(
                    obs_params_f(zf)["logits"], (y_val.shape[0],)
                ).ravel()

            ab = _affine_probe(jax.jit(f_logits), dim)
            if ab is None:
                return None
            x_mat, b_vec = ab
            fam = FusedFamily(
                "bernoulli_logit", jnp.asarray(x_mat), jnp.asarray(y_val),
                jnp.asarray(b_vec), None, 0.0, prior_mean, prior_inv_var,
                ll_scale,
            )
        elif isinstance(dist, Categorical):
            if "logits" not in obs_var.links:
                return None
            y_int = np.asarray(obs_var._observed).astype(np.int64).ravel()
            n = int(y_int.shape[0])
            lg0 = np.asarray(obs_params_f(jnp.zeros((dim,), jnp.float32))["logits"])
            num_classes = int(lg0.shape[-1])
            if n * num_classes * dim > 5e7:
                return None  # probe matrix would not fit comfortably

            def f_logits_flat(zf):
                lg = obs_params_f(zf)["logits"]
                return jnp.broadcast_to(lg, (n, num_classes)).reshape(-1)

            ab = _affine_probe(jax.jit(f_logits_flat), dim)
            if ab is None:
                return None
            fam = _extract_categorical(
                ab[0], ab[1], y_int, n, num_classes, dim,
                prior_mean, prior_inv_var, ll_scale,
            )
        elif isinstance(dist, AutoRegressive):
            p = dist.order
            lags = np.stack(
                [y_val[p - 1 - i : y_val.shape[0] - 1 - i] for i in range(p)],
                axis=-1,
            )  # [T-p, p]
            y_eff = y_val[p:]

            def f_loc(zf):
                pr_ = obs_params_f(zf)
                c = jnp.atleast_1d(pr_["coefficients"])
                return (jnp.asarray(lags) @ c
                        + jnp.broadcast_to(pr_.get("bias", 0.0), y_eff.shape))

            def f_logscale(zf):
                return jnp.log(
                    jnp.atleast_1d(obs_params_f(zf)["noise_scale"]).ravel()[0:1]
                )

            if not _scale_is_shared(obs_params_f, "noise_scale", dim):
                return None

            fam = _extract_normal_learned(
                f_loc, f_logscale, y_eff, dim, prior_mean, prior_inv_var,
                ll_scale,
            )
        elif isinstance(dist, Normal):
            def f_loc(zf):
                return jnp.broadcast_to(
                    obs_params_f(zf)["loc"], (y_val.shape[0],)
                ).ravel()

            def f_logscale(zf):
                return jnp.log(
                    jnp.atleast_1d(obs_params_f(zf)["scale"]).ravel()[0:1]
                )

            if not _scale_is_shared(obs_params_f, "scale", dim):
                return None

            fam = _extract_normal_learned(
                f_loc, f_logscale, y_val, dim, prior_mean, prior_inv_var,
                ll_scale,
            )
        else:
            return None
        if fam is None:
            return None
        fused = fam.value_and_grad(use_pallas=False)

        # ---- final self-check vs the autodiff density ------------------
        def pot(zf):
            return comp.log_density_z(params, unravel(zf), given)

        rng = np.random.RandomState(2)
        zs = jnp.asarray(rng.normal(0, 1, size=(3, dim)).astype(np.float32))
        v_ref, g_ref = jax.jit(jax.vmap(jax.value_and_grad(pot)))(zs)
        v_f, g_f = jax.jit(fused)(zs)
        v_ref, g_ref = np.asarray(v_ref), np.asarray(g_ref)
        v_f, g_f = np.asarray(v_f), np.asarray(g_f)
        dv = (v_f - v_ref)
        scale_v = max(1.0, float(np.max(np.abs(v_ref))))
        scale_g = max(1.0, float(np.max(np.abs(g_ref))))
        if not np.allclose(dv - dv[0], 0.0, atol=3e-3 * scale_v):
            return None
        if not np.allclose(g_f, g_ref, atol=3e-3 * scale_g):
            return None
        return fam
    except Exception:
        return None


def _scale_is_shared(obs_params_f, key_name: str, dim: int) -> bool:
    """True iff the observed scale is one shared value across elements
    (possibly plate-broadcast) at a random probe point — the
    normal_learned family has a single log-noise per chain."""
    zr = jnp.asarray(np.random.RandomState(5).normal(0, 1, dim).astype(np.float32))
    sc = np.asarray(jnp.atleast_1d(obs_params_f(zr)[key_name]).ravel())
    return bool(np.allclose(sc, sc[0], rtol=1e-6, atol=0.0))


def _extract_normal_learned(f_loc, f_logscale, y, dim, prior_mean,
                            prior_inv_var, ll_scale) -> Optional[FusedFamily]:
    ab = _affine_probe(jax.jit(f_loc), dim)
    if ab is None:
        return None
    x_mat, b_vec = ab
    ab_s = _affine_probe(jax.jit(f_logscale), dim)
    if ab_s is None:
        return None
    u_vec, c0 = ab_s[0][0], float(ab_s[1][0])  # [D], scalar
    return FusedFamily(
        "normal_learned", jnp.asarray(x_mat), jnp.asarray(y),
        jnp.asarray(b_vec), jnp.asarray(u_vec), c0, prior_mean,
        prior_inv_var, ll_scale,
    )
