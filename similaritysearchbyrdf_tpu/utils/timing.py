"""Tracing / profiling spans.

The reference has no tracing subsystem — ad-hoc `System.currentTimeMillis`
prints (SURVEY.md §5). Here: lightweight nested spans with device sync, a
span registry for programmatic access, and optional JAX profiler traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Tuple


class Tracer:
    def __init__(self) -> None:
        self.spans: Dict[str, List[float]] = defaultdict(list)
        self._stack: List[str] = []

    @contextlib.contextmanager
    def span(self, name: str, sync: bool = False) -> Iterator[None]:
        """Time a block; `sync=True` blocks on all device work first/after so
        the span measures device time, not dispatch time."""
        if sync:
            _block_all()
        full = "/".join(self._stack + [name])
        self._stack.append(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                _block_all()
            self.spans[full].append(time.perf_counter() - t0)
            self._stack.pop()

    def summary(self) -> List[Tuple[str, int, float, float]]:
        """[(name, count, total_s, mean_s)] sorted by total time."""
        rows = [
            (name, len(v), sum(v), sum(v) / len(v))
            for name, v in self.spans.items()
        ]
        return sorted(rows, key=lambda r: -r[2])

    def report(self) -> str:
        lines = [f"{'span':40s} {'n':>5s} {'total_ms':>10s} {'mean_ms':>10s}"]
        for name, n, tot, mean in self.summary():
            lines.append(f"{name:40s} {n:5d} {tot*1e3:10.2f} {mean*1e3:10.2f}")
        return "\n".join(lines)

    def reset(self) -> None:
        self.spans.clear()


def _block_all() -> None:
    try:
        import jax

        (jax.device_put(0) + 0).block_until_ready()
    except Exception:
        pass


default_tracer = Tracer()
span = default_tracer.span


@contextlib.contextmanager
def jax_profile(logdir: str) -> Iterator[None]:
    """Capture a JAX profiler trace (viewable in TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
