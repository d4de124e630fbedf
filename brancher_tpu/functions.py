"""Function/NN bridge — the ``BF`` namespace.

Reference parity: Brancher's ``functions.py`` (imported as ``BF``) lifts
torch callables and ``nn.Module``s into graph nodes and collects trainable
parameters for the optimizer (SURVEY.md §2 "Function bridge", L3).

TPU-first: ``BrancherFunction`` lifts *any JAX callable* into a PartialLink
factory; flax ``linen.Module``s are lifted with lazy parameter
initialization — their params register into the model's ParamStore during
the compiler's shape-probe pass and train as ordinary pytree leaves under
``jax.grad`` + optax (no stateful modules at runtime).

Usage mirrors the reference::

    import brancher_tpu.functions as BF
    y = BF.exp(x) + BF.matmul(w, h)
    net = BF.BrancherFunction(flax_module, name="decoder")
    logits = net(z)
"""
from __future__ import annotations

import itertools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .variables import ParamStore, PartialLink, var2link

_fn_counter = itertools.count()


def _is_flax_module(fn: Any) -> bool:
    try:
        import flax.linen as nn

        return isinstance(fn, nn.Module)
    except Exception:
        return False


class BrancherFunction:
    """Lift a JAX callable or flax Module into a symbolic-graph function."""

    def __init__(self, fn: Any, name: Optional[str] = None):
        self.fn = fn
        self.is_module = _is_flax_module(fn)
        base = name or getattr(fn, "__name__", None) or type(fn).__name__
        self.name = f"{base}__fn{next(_fn_counter)}" if name is None else name

    def __call__(self, *args, **kwargs) -> PartialLink:
        links = [var2link(a) for a in args]
        kw_links = {k: var2link(v) for k, v in kwargs.items()}
        all_vars = [v for l in links for v in l.vars]
        all_vars += [v for l in kw_links.values() for v in l.vars]

        if self.is_module:
            module = self.fn
            pname = f"{self.name}__params"

            def fn(values, params: ParamStore):
                xs = [l.fn(values, params) for l in links]
                kx = {k: l.fn(values, params) for k, l in kw_links.items()}
                mp = params.get(pname, lambda rng: module.init(rng, *xs, **kx))
                return module.apply(mp, *xs, **kx)

        else:
            raw = self.fn

            def fn(values, params: ParamStore):
                xs = [l.fn(values, params) for l in links]
                kx = {k: l.fn(values, params) for k, l in kw_links.items()}
                return raw(*xs, **kx)

        return PartialLink(all_vars, fn)


def _lift(fn: Callable, name: str) -> Callable:
    def wrapper(*args, **kwargs):
        # keyword args that are plain python config (axis=...) pass through
        links = [var2link(a) for a in args]
        all_vars = [v for l in links for v in l.vars]
        sym_kw = {k: var2link(v) for k, v in kwargs.items() if _is_symbolic(v)}
        static_kw = {k: v for k, v in kwargs.items() if not _is_symbolic(v)}
        all_vars += [v for l in sym_kw.values() for v in l.vars]

        def link_fn(values, params):
            xs = [l.fn(values, params) for l in links]
            kx = {k: l.fn(values, params) for k, l in sym_kw.items()}
            return fn(*xs, **kx, **static_kw)

        return PartialLink(all_vars, link_fn)

    wrapper.__name__ = name
    return wrapper


def _is_symbolic(v) -> bool:
    from .variables import Variable

    return isinstance(v, (Variable, PartialLink))


# -- lifted math namespace (mirrors the reference's BF.*) -------------------
exp = _lift(jnp.exp, "exp")
log = _lift(jnp.log, "log")
log1p = _lift(jnp.log1p, "log1p")
sqrt = _lift(jnp.sqrt, "sqrt")
abs = _lift(jnp.abs, "abs")
sin = _lift(jnp.sin, "sin")
cos = _lift(jnp.cos, "cos")
tan = _lift(jnp.tan, "tan")
tanh = _lift(jnp.tanh, "tanh")
sinh = _lift(jnp.sinh, "sinh")
cosh = _lift(jnp.cosh, "cosh")
erf = _lift(jax.scipy.special.erf, "erf")
sigmoid = _lift(jax.nn.sigmoid, "sigmoid")
softplus = _lift(jax.nn.softplus, "softplus")
softmax = _lift(jax.nn.softmax, "softmax")
log_softmax = _lift(jax.nn.log_softmax, "log_softmax")
relu = _lift(jax.nn.relu, "relu")
gelu = _lift(jax.nn.gelu, "gelu")
matmul = _lift(jnp.matmul, "matmul")
dot = _lift(jnp.dot, "dot")
einsum = _lift(jnp.einsum, "einsum")
sum = _lift(jnp.sum, "sum")
prod = _lift(jnp.prod, "prod")
mean = _lift(jnp.mean, "mean")
max = _lift(jnp.max, "max")
min = _lift(jnp.min, "min")
reshape = _lift(jnp.reshape, "reshape")
transpose = _lift(jnp.transpose, "transpose")
squeeze = _lift(jnp.squeeze, "squeeze")
expand_dims = _lift(jnp.expand_dims, "expand_dims")
clip = _lift(jnp.clip, "clip")
where = _lift(jnp.where, "where")
power = _lift(jnp.power, "power")
maximum = _lift(jnp.maximum, "maximum")
minimum = _lift(jnp.minimum, "minimum")
take = _lift(jnp.take, "take")
one_hot = _lift(jax.nn.one_hot, "one_hot")
cumsum = _lift(jnp.cumsum, "cumsum")


def cat(links, axis=0):
    """Concatenate symbolic tensors (reference's BF.cat)."""
    links = [var2link(l) for l in links]
    all_vars = [v for l in links for v in l.vars]
    return PartialLink(
        all_vars,
        lambda values, params: jnp.concatenate([l.fn(values, params) for l in links], axis=axis),
    )


concat = cat


def stack(links, axis=0):
    links = [var2link(l) for l in links]
    all_vars = [v for l in links for v in l.vars]
    return PartialLink(
        all_vars,
        lambda values, params: jnp.stack([l.fn(values, params) for l in links], axis=axis),
    )
