"""Structured metrics / profiling hooks.

Reference parity: Brancher keeps a loss list + tqdm bar (SURVEY.md §5
"Metrics").  The rebuild returns history pytrees from every engine and
adds: a JSONL metrics writer, optional TensorBoard (if available), and
jax.profiler trace capture around hot sections.
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Any, Dict, Optional

import numpy as np


class MetricsLogger:
    """Append-only JSONL metrics stream + optional TensorBoard."""

    def __init__(self, path: Optional[str] = None, tensorboard_dir: Optional[str] = None):
        self.path = path
        self._fh = open(path, "a") if path else None
        self._tb = None
        if tensorboard_dir:
            try:
                from flax.metrics import tensorboard

                self._tb = tensorboard.SummaryWriter(tensorboard_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, **metrics) -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            rec[k] = float(np.asarray(v))
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self._tb:
            for k, v in metrics.items():
                self._tb.scalar(k, float(np.asarray(v)), step)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
        if self._tb:
            self._tb.flush()


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/brancher_tpu_trace"):
    """Capture a jax.profiler trace (Perfetto-compatible) around a block:

        with profile_trace("/tmp/trace"):
            sample(model, ...)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def summarize_mcmc(result) -> Dict[str, Any]:
    """One-line-per-variable summary table data (mean/sd/ess/rhat)."""
    out = {}
    for name, s in result.samples.items():
        arr = np.asarray(s)
        flat = arr.reshape(arr.shape[0] * arr.shape[1], -1)
        entry = {
            "mean": flat.mean(0),
            "sd": flat.std(0),
        }
        if name in result.diagnostics.get("ess", {}):
            entry["ess"] = np.asarray(result.diagnostics["ess"][name])
            entry["r_hat"] = np.asarray(result.diagnostics["r_hat"][name])
        out[name] = entry
    return out
