"""Training observability: loss, PSNR, throughput.

The reference never reports a loss value anywhere (SURVEY §5); PSNR and
structured step logs are new capability required by the baseline harness.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Any, Optional, TextIO

import jax
import jax.numpy as jnp
import numpy as np


def mse(a, b) -> jnp.ndarray:
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return jnp.mean((a - b) ** 2)


def psnr(a, b, max_val: float = 1.0) -> jnp.ndarray:
    m = mse(a, b)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(m, 1e-12))


def ssim(a, b, max_val: float = 1.0, win: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Structural similarity (Wang et al. 2004) with the standard 11x11
    gaussian window — the quality metric 3DGS papers report alongside PSNR
    (the reference reports neither; SURVEY §5).  a, b: (H, W, 3) in
    [0, max_val].  Pure jnp (separable depthwise convolutions)."""
    a = jnp.asarray(a, jnp.float32) / max_val
    b = jnp.asarray(b, jnp.float32) / max_val
    r = jnp.arange(win, dtype=jnp.float32) - (win - 1) / 2.0
    g = jnp.exp(-0.5 * (r / sigma) ** 2)
    g = g / jnp.sum(g)

    def blur(x):  # separable gaussian filter, valid padding, per channel
        x = jnp.moveaxis(x, -1, 0)[:, None]  # (C, 1, H, W)
        kh = g.reshape(1, 1, win, 1)
        kw = g.reshape(1, 1, 1, win)
        for k in (kh, kw):
            x = jax.lax.conv_general_dilated(
                x, k, (1, 1), "VALID",
                feature_group_count=1,
            )
        return x[:, 0]  # (C, H', W')

    c1 = 0.01**2
    c2 = 0.03**2
    mu_a, mu_b = blur(a), blur(b)
    var_a = blur(a * a) - mu_a * mu_a
    var_b = blur(b * b) - mu_b * mu_b
    cov = blur(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return jnp.mean(s)


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
