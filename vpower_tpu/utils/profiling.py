"""Tracing / profiling utilities.

The reference instrumented with ad-hoc ``datetime.now()`` prints, tqdm
stage weights, and commented-out memory_profiler decorators (SURVEY.md
§5).  Equivalent here, promoted to a reusable layer:

* :class:`StageTimer` — named wall-clock spans with explicit device
  synchronization (``block_until_ready`` is a no-op on some remote
  execution platforms, so the sync transfers a scalar);
* :func:`trace` — a ``jax.profiler`` trace context writing a
  TensorBoard-compatible trace directory;
* :class:`Progress` — rank-0-style stage-weighted progress printing
  (the reference's tqdm usage, ``parallel_optimized.py:263, 314, 384``).
"""
from __future__ import annotations

import contextlib
import datetime
import time
from typing import Dict, List, Optional

import numpy as np

import jax

__all__ = ["StageTimer", "trace", "Progress", "sync", "log"]


def sync(x=None) -> None:
    """Force device completion.  A tiny device->host transfer — reliable
    even where ``block_until_ready`` returns immediately (remote
    execution backends)."""
    if x is None:
        import jax.numpy as jnp

        x = jnp.zeros(())
    leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "dtype")]
    if leaves:
        import jax.numpy as jnp

        leaf = leaves[0].ravel()[:1]
        if jnp.iscomplexobj(leaf):
            leaf = jnp.real(leaf)  # some platforms can't transfer complex
        np.asarray(leaf)


def log(msg: str) -> None:
    """Timestamped print (the reference's
    ``print(f'[{datetime.now()}] ...', flush=True)`` idiom)."""
    print(f"[{datetime.datetime.now()}] {msg}", flush=True)


class StageTimer:
    """Accumulate named wall-clock spans.

    >>> timer = StageTimer()
    >>> with timer("deposit"):
    ...     field = deposit(particles, 512)
    >>> print(timer.report())
    """

    def __init__(self, device_sync: bool = True):
        self.spans: Dict[str, List[float]] = {}
        self.device_sync = device_sync
        self._result = None

    @contextlib.contextmanager
    def __call__(self, name: str, result=None):
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            if self.device_sync:
                sync(self._result)
                self._result = None
            self.spans.setdefault(name, []).append(time.perf_counter() - t0)

    def observe(self, result) -> None:
        """Register the stage's output so the closing sync waits on it."""
        self._result = result

    def total(self, name: str) -> float:
        return float(sum(self.spans.get(name, [])))

    def report(self) -> str:
        lines = []
        grand = sum(sum(v) for v in self.spans.values())
        for name, vals in self.spans.items():
            t = sum(vals)
            pct = 100.0 * t / grand if grand else 0.0
            lines.append(
                f"{name:<24s} {t:8.3f}s  x{len(vals):<4d} {pct:5.1f}%"
            )
        lines.append(f"{'total':<24s} {grand:8.3f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler`` trace context (TensorBoard format) — the
    replacement for the reference's memory_profiler runs
    (``scripts/bcmk.txt``)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Progress:
    """Stage-weighted textual progress, mirroring the reference's tqdm
    weights (5% index / 80% query / 10% FFT / 5% save,
    ``parallel_optimized.py:263-487``)."""

    def __init__(self, total: float = 100.0, enabled: bool = True):
        self.total = total
        self.done = 0.0
        self.enabled = enabled
        self._t0 = time.perf_counter()

    def update(self, amount: float, stage: Optional[str] = None) -> None:
        self.done = min(self.total, self.done + amount)
        if not self.enabled:
            return
        pct = 100.0 * self.done / self.total
        elapsed = time.perf_counter() - self._t0
        eta = elapsed * (self.total - self.done) / self.done if self.done else 0
        tag = f" [{stage}]" if stage else ""
        print(
            f"\rprogress {pct:5.1f}%{tag} elapsed {elapsed:6.1f}s "
            f"eta {eta:6.1f}s",
            end="" if pct < 100 else "\n",
            flush=True,
        )
