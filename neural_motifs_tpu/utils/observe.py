"""Observability: parameter table, step timing, optional profiler trace.

Replaces the reference's print_para (pytorch_misc.py:185-203) and the
seconds/batch prints; adds first-class jax.profiler hooks which the
reference never had (SURVEY §5: "Tracing/profiling: none").
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np
from flax.traverse_util import flatten_dict


def print_para(params) -> str:
    """Table of parameter names/shapes/sizes, largest first."""
    flat = flatten_dict(jax.device_get(params), sep="/")
    rows = [(k, tuple(np.shape(v)), int(np.size(v))) for k, v in flat.items()]
    rows.sort(key=lambda r: -r[2])
    total = sum(r[2] for r in rows)
    lines = [f"{'name':60s} {'shape':>20s} {'size':>12s}"]
    for k, shape, size in rows:
        lines.append(f"{k:60s} {str(shape):>20s} {size:>12,d}")
    lines.append(f"{'TOTAL':60s} {'':>20s} {total:>12,d}")
    out = "\n".join(lines)
    print(out)
    return out


class StepTimer:
    """Rolling s/batch + min/epoch reporting (train_rels.py:107-114)."""

    def __init__(self, window: int = 100):
        self.window = window
        self.times: list[float] = []
        self._last = None

    def tick(self) -> float | None:
        now = time.time()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.times.append(dt)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now
        return dt

    @property
    def s_per_batch(self) -> float:
        return float(np.mean(self.times)) if self.times else float("nan")

    def report(self, steps_per_epoch: int) -> str:
        spb = self.s_per_batch
        return f"{spb:.3f}s/batch, {spb * steps_per_epoch / 60:.1f}m/epoch"


@contextlib.contextmanager
def maybe_profile(trace_dir: str | None):
    """`with maybe_profile(dir):` wraps a region in a jax.profiler trace."""
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield


class PairBudgetTelemetry:
    """Exactness accounting for eval pair compaction (max_pairs_eval).

    Compaction keeps the top-`budget` valid pairs per image; it is exact iff
    the pre-compaction valid-pair count (SGPrediction.num_valid_pairs) fits
    the budget. The reference scores EVERY candidate pair
    (lib/rel_model.py:416-437), so any overflow silently caps recall — this
    aggregates and reports it per epoch ("no silent caps")."""

    def __init__(self, budget: int):
        self.budget = int(budget)
        self.images = 0
        self.overflow_images = 0
        self.dropped_pairs = 0
        self.max_valid = 0

    def update(self, num_valid_pairs) -> None:
        if num_valid_pairs is None:
            return
        nv = np.asarray(num_valid_pairs).astype(np.int64)
        self.images += int(nv.size)
        over = nv - self.budget
        self.overflow_images += int((over > 0).sum())
        self.dropped_pairs += int(np.clip(over, 0, None).sum())
        if nv.size:
            self.max_valid = max(self.max_valid, int(nv.max()))

    def report(self) -> str:
        if self.overflow_images == 0:
            return (f"[pairs] compaction budget {self.budget}: EXACT on all "
                    f"{self.images} images (max valid pairs {self.max_valid})")
        return (f"[pairs] WARNING: compaction budget {self.budget} overflowed "
                f"on {self.overflow_images}/{self.images} images "
                f"({self.dropped_pairs} valid pairs dropped, max valid "
                f"{self.max_valid}). Results are NOT exact vs the reference "
                f"(it scores every pair) — raise -max_pairs_eval.")
