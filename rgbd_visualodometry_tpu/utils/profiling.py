"""Per-stage wall timing and XLA-level profiling hooks.

Replaces the reference's ``boost::timer::cpu_timer`` per-frame print
(``app/run_vo.cpp:104-109``) with:

- :class:`StageTimer` - named wall-clock sections that block on device
  results (`jax.block_until_ready`), so the numbers mean device time and
  not dispatch latency;
- :func:`xla_trace` - a context manager around ``jax.profiler`` producing a
  TensorBoard/perfetto trace directory for op-level analysis.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulate wall time per named stage.

    Usage::

        t = StageTimer()
        with t.stage("track"):
            out = step(...)          # blocked on exit
        print(t.summary())
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self._block_target = None

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            target = holder.get("result", block_on)
            if target is not None:
                jax.block_until_ready(target)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {total * 1e3:.1f} ms total, {total / n * 1e3:.2f} ms/call (n={n})")
        return "\n".join(lines)


@contextlib.contextmanager
def xla_trace(out_dir: str = "/tmp/rgbd_vo_trace"):
    """Capture an XLA profiler trace (view in TensorBoard or parse the
    ``*.trace.json.gz`` perfetto events)."""
    jax.profiler.start_trace(out_dir)
    try:
        yield out_dir
    finally:
        jax.profiler.stop_trace()
