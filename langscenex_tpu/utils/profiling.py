"""Tracing / profiling as first-class (SURVEY.md §5: the reference has
none beyond dead CUDA event pairs; we provide jax.profiler traces + EMA
step timers as the framework's observability layer)."""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class StepTimer:
    """Per-phase EMA wall-clock timer. The reference's tqdm postfix uses
    0.4/0.6 EMA smoothing (gaussian_field.py:490-511); same decay here."""

    def __init__(self, decay: float = 0.6):
        self.decay = decay
        self.ema: Dict[str, float] = {}
        self.count: Dict[str, int] = defaultdict(int)
        self._t0: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            prev = self.ema.get(name)
            self.ema[name] = dt if prev is None else \
                (1 - self.decay) * dt + self.decay * prev
            self.count[name] += 1

    def summary(self) -> str:
        return " ".join(f"{k}={v * 1000:.1f}ms" for k, v in
                        sorted(self.ema.items()))


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context writing a perfetto/xplane trace."""
    import jax
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named trace annotation (shows up in profiler timelines)."""
    import jax
    return jax.profiler.TraceAnnotation(name)
