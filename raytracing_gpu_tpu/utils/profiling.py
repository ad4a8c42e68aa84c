"""Profiling & observability.

The reference's story is `std::chrono` wall-clock in main (`main.cu:10-13,
39-45`) and makefile nvprof targets (`build/makefile:21-26`).  TPU plan
(SURVEY §5): `jax.profiler` traces + per-phase timing + rays/s gauges.
"""

from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

logger = logging.getLogger("raytracing_gpu_tpu")


@dataclass
class RaysPerSecond:
    """Simple rays/s gauge: wrap a timed region and read `.mrays`."""

    seconds: float = 0.0
    rays: int = 0

    @contextlib.contextmanager
    def measure(self, rays: int):
        t0 = time.perf_counter()
        yield
        self.seconds = time.perf_counter() - t0
        self.rays = rays

    @property
    def mrays(self) -> float:
        return self.rays / self.seconds / 1e6 if self.seconds else 0.0


@dataclass
class PhaseTimer:
    """Structured per-phase timing (build / trace / shade / io), the gauge set
    SURVEY §5 prescribes in place of the reference's aggregate wall clock."""

    phases: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        total = sum(self.phases.values()) or 1.0
        lines = [
            f"{name:>12}: {dt:8.3f}s ({100 * dt / total:5.1f}%) x{self.counts[name]}"
            for name, dt in sorted(self.phases.items(), key=lambda kv: -kv[1])
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace context (XProf/Perfetto-compatible); no-op when
    log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax.profiler

    with jax.profiler.trace(log_dir):
        yield


def enable_nan_debugging() -> None:
    """Turn on jax_debug_nans — the TPU-side replacement for the reference's
    abort-on-error `checkCudaErrors` (`common.h:30-38`) during debugging."""
    import jax

    jax.config.update("jax_debug_nans", True)
