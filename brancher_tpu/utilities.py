"""Shape/broadcast/sample-dict helpers.

Reference parity: Brancher's ``utilities.py`` holds dtype coercion and
leading-sample-axis broadcasting helpers (SURVEY.md §2 "Utilities").  The
TPU rebuild needs far less manual broadcasting because the sample axis is
handled by ``jax.vmap`` at the compiler level; what remains here are pure
shape utilities and sample-dict (pytree) manipulation shared by the
engines.
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, Mapping, Sequence

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from .config import default_dtype

Array = jax.Array
SampleDict = Dict[str, Array]


def to_array(value: Any, dtype=None) -> Array:
    """Coerce python scalars / numpy arrays / jax arrays to a jax array.

    Integer-typed inputs for float parameters are coerced to the default
    float dtype; bool and int arrays passed explicitly keep their dtype.
    """
    if isinstance(value, jax.Array):
        return value
    arr = np.asarray(value)
    if dtype is None:
        if arr.dtype.kind in "fc":
            dtype = default_dtype()
        elif arr.dtype.kind in "iu" and not isinstance(value, (np.ndarray,)):
            # Bare python ints used as distribution parameters are almost
            # always meant as floats (e.g. NormalVariable(0, 1)).
            dtype = default_dtype()
    return jnp.asarray(arr, dtype=dtype)


def broadcast_shapes(*shapes: Sequence[int]) -> tuple:
    return jnp.broadcast_shapes(*shapes)


def sum_all(x: Array) -> Array:
    """Sum every axis -> scalar.  Used to reduce per-variable log-probs."""
    return jnp.sum(x)


def merge_sample_dicts(dicts: Iterable[Mapping[str, Array]]) -> SampleDict:
    out: SampleDict = {}
    for d in dicts:
        out.update(d)
    return out


def tree_stack(trees: Sequence[Any]) -> Any:
    """Stack a list of identical pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def tree_index(tree: Any, idx) -> Any:
    return jax.tree_util.tree_map(lambda x: x[idx], tree)


def tree_flatten_concat(tree: Any) -> tuple:
    """Flatten a pytree of arrays into one 1-D vector + an unravel fn.

    The flat order is deterministic (pytree order).  Used by samplers that
    want a single dense position vector (e.g. the Pallas leapfrog kernel and
    dense mass-matrix adaptation).
    """
    flat, unravel = jax.flatten_util.ravel_pytree(tree)
    return flat, unravel


def split_key_dict(key: Array, names: Sequence[str]) -> Dict[str, Array]:
    """Deterministically derive one key per name via fold_in on the index."""
    return {name: jax.random.fold_in(key, i) for i, name in enumerate(names)}
