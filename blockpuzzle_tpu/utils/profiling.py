"""Tracing / profiling hooks (SURVEY.md §5 "Tracing / profiling").

Wraps ``jax.profiler`` so any CLI can capture a device trace viewable in the
installed tensorboard_plugin_profile, plus a cheap wall-clock scope timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture an XLA device trace into ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ScopeTimer:
    """Accumulating named wall-clock scopes for coarse host-side breakdown."""

    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def scope(self, name: str) -> Iterator[None]:
        t0 = time.time()
        with jax.named_scope(name):
            yield
        self.totals[name] = self.totals.get(name, 0.0) + time.time() - t0

    def summary(self) -> Dict[str, float]:
        return dict(sorted(self.totals.items(), key=lambda kv: -kv[1]))
