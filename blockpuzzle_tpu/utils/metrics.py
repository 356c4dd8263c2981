"""Metrics / logging / observability (SURVEY.md §5).

The reference logs via ``print``/``render``; the target pumps already-reduced
device scalars to the host once per update (never per env step) and fans them
out to JSONL + TensorBoard.  Device→host transfer cost is one tiny
``jax.device_get`` per update.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np


class MetricsLogger:
    """JSONL always; TensorBoard when tensorboardX is importable."""

    def __init__(self, log_dir: Optional[str] = None, run_name: str = "run"):
        self.log_dir = log_dir
        self._jsonl = None
        self._tb = None
        self._t0 = time.time()
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(
                os.path.join(log_dir, f"{run_name}.jsonl"), "a", buffering=1
            )
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(log_dir, run_name))
            except ImportError:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, Any]) -> Dict[str, float]:
        """device_get + fan out; returns the host-side scalar dict."""
        host = {
            k: float(np.asarray(v))
            for k, v in jax.device_get(metrics).items()
        }
        host["wall_time"] = time.time() - self._t0
        if self._jsonl:
            self._jsonl.write(json.dumps({"step": step, **host}) + "\n")
        if self._tb:
            for k, v in host.items():
                self._tb.add_scalar(k, v, step)
        return host

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()


class Throughput:
    """Steady-state env-steps/s meter (excludes the first, compiling, call)."""

    def __init__(self):
        self._t = None
        self._steps = 0
        self.value = 0.0

    def tick(self, env_steps: int) -> float:
        now = time.time()
        if self._t is None:  # first tick = end of compile; start counting
            self._t = now
            self._steps = 0
            return 0.0
        self._steps += env_steps
        # two ticks within timer resolution (tiny debug runs) must not
        # divide by ~0
        self.value = self._steps / max(now - self._t, 1e-9)
        return self.value
