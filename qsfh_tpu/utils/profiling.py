"""Phase timers + optional XLA profiler traces.

The reference's only instrumentation is wall-clock bracketing in two
drivers (``/root/reference/models/adapt_vqe.py:367,465-467``,
``vqe_hea.py:66,100-101``) -- SURVEY.md section 5.1 calls for a real
metrics module.  ``PhaseTimer`` accumulates named phase durations
(setup / screening / inner-loop / checkpoint / ...) and reports a
breakdown; ``xla_trace`` wraps ``jax.profiler.trace`` when a trace dir is
requested (QSFH_TRACE_DIR env var or explicit argument).
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Optional


class PhaseTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._t0 = time.time()

    @contextlib.contextmanager
    def phase(self, name: str):
        start = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - start
            self.counts[name] += 1

    def report(self) -> str:
        wall = time.time() - self._t0
        lines = [f"wall: {wall:.2f}s"]
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f"  {name}: {total:.2f}s ({100 * total / max(wall, 1e-9):.0f}%, "
                f"{n} calls, {1e3 * total / n:.1f} ms/call)"
            )
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.totals)


@contextlib.contextmanager
def xla_trace(trace_dir: Optional[str] = None):
    """Capture an XLA profiler trace if a directory is configured.

    View with TensorBoard's profile plugin or xprof.  No-op when neither
    ``trace_dir`` nor QSFH_TRACE_DIR is set.
    """
    trace_dir = trace_dir or os.environ.get("QSFH_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
