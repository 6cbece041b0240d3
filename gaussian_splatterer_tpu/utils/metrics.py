"""Training observability: loss, PSNR, throughput.

The reference never reports a loss value anywhere (SURVEY §5); PSNR and
structured step logs are new capability required by the baseline harness.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Any, Optional, TextIO

import jax.numpy as jnp
import numpy as np


def mse(a, b) -> jnp.ndarray:
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return jnp.mean((a - b) ** 2)


def psnr(a, b, max_val: float = 1.0) -> jnp.ndarray:
    m = mse(a, b)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(m, 1e-12))


@dataclass
class StepLog:
    iteration: int
    loss: float
    splat_count: int
    steps_per_s: float
    psnr: Optional[float] = None
    extra: dict[str, Any] = field(default_factory=dict)


class MetricsLogger:
    """JSONL step logger with wall-clock throughput tracking."""

    def __init__(self, file: Optional[TextIO] = None, log_every: int = 10):
        self.file = file
        self.log_every = log_every
        self._t_last = time.perf_counter()
        self._steps_since = 0
        self.history: list[StepLog] = []

    def log_step(self, iteration: int, loss: float, splat_count: int, **extra) -> None:
        self._steps_since += 1
        if iteration % self.log_every:
            return
        now = time.perf_counter()
        dt = max(now - self._t_last, 1e-9)
        rate = self._steps_since / dt
        self._t_last, self._steps_since = now, 0
        entry = StepLog(
            iteration=iteration,
            loss=float(loss),
            splat_count=int(splat_count),
            steps_per_s=float(rate),
            psnr=float(extra.pop("psnr")) if "psnr" in extra else None,
            extra={k: _tofloat(v) for k, v in extra.items()},
        )
        self.history.append(entry)
        if self.file is not None:
            rec = {
                "iteration": entry.iteration,
                "loss": entry.loss,
                "splats": entry.splat_count,
                "steps_per_s": entry.steps_per_s,
            }
            if entry.psnr is not None:
                rec["psnr"] = entry.psnr
            rec.update(entry.extra)
            self.file.write(json.dumps(rec) + "\n")
            self.file.flush()


def _tofloat(v):
    if isinstance(v, (jnp.ndarray, np.ndarray)):
        return float(v)
    return v
