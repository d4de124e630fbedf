"""Samples <-> pandas DataFrames.

Reference parity: Brancher's ``pandas_interface.py`` converts
``{variable: tensor}`` sample dicts into tidy DataFrames (rows = sample
index, cols = variables; SURVEY.md §2 "Pandas interface", §3.2).
Host-side only — never on the device path.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np


def sample_dict_to_dataframe(sample_dict: Mapping[str, Any]):
    import pandas as pd

    cols = {}
    n = None
    for name, arr in sample_dict.items():
        a = np.asarray(arr)
        if n is None:
            n = a.shape[0] if a.ndim > 0 else 1
        if a.ndim == 0:
            cols[name] = [a.item()] * (n or 1)
        elif a.ndim == 1:
            cols[name] = list(a)
        else:
            cols[name] = [a[i] for i in range(a.shape[0])]
    return pd.DataFrame(cols)


def dataframe_to_sample_dict(df) -> Dict[str, np.ndarray]:
    out = {}
    for col in df.columns:
        vals = df[col].tolist()
        out[col] = np.stack([np.asarray(v) for v in vals])
    return out


def coerce_to_sample_dict(samples) -> Dict[str, Any]:
    """Accept raw dicts, DataFrames, or {Variable: array} mappings."""
    try:
        import pandas as pd

        if isinstance(samples, pd.DataFrame):
            return {k: jnp.asarray(v) for k, v in dataframe_to_sample_dict(samples).items()}
    except ImportError:
        pass
    out = {}
    for k, v in samples.items():
        name = getattr(k, "name", k)
        out[name] = jnp.asarray(v)
    return out


def reformat_sample_to_pandas(sample_dict):
    """Alias kept for reference-API familiarity."""
    return sample_dict_to_dataframe(sample_dict)
