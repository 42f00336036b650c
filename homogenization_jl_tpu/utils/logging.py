"""Step metrics & profiling hooks.

The reference logs per-V-cycle residual norms and per-step domain stats via
@info (SURVEY.md §5); here: a structured StepLogger (stdout or JSONL) plus an
optional jax.profiler trace context for TPU timeline capture.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time


class StepLogger:
    """Collects per-cycle / per-step metrics; optionally writes JSONL."""

    def __init__(self, path: str | None = None, echo: bool = True):
        self.path = path
        self.echo = echo
        self.records = []
        self._fh = open(path, "a") if path else None
        self._t0 = time.perf_counter()

    def log(self, **fields):
        fields.setdefault("t", round(time.perf_counter() - self._t0, 4))
        self.records.append(fields)
        if self._fh:
            self._fh.write(json.dumps(fields) + "\n")
            self._fh.flush()
        if self.echo:
            msg = " ".join(
                f"{key}={v:.4g}" if isinstance(v, float) else f"{key}={v}"
                for key, v in fields.items()
            )
            print(msg, file=sys.stderr)

    def close(self):
        if self._fh:
            self._fh.close()


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """jax.profiler trace context (view in TensorBoard / xprof). No-op when
    logdir is None."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
