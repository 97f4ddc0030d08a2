"""Adaptive entry-table capacity for the rasterizer (ROADMAP perf item).

The binning stage uses a STATIC entry capacity (XLA needs static
shapes); every downstream cost — entry sort, record gather, composite
chunks, grad table — scales with it. A fixed 4N multiplier wastes half
the step time on sparse scenes and drops entries on dense ones
(`n_dropped`). This controller picks the multiplier from live feedback,
re-jitting only on power-of-two changes:

  * grow (x2, up to `max_mult`) as soon as a step drops > `grow_frac`
    of its entries — quality first;
  * shrink (/2, down to `min_mult`) only after `shrink_patience`
    consecutive steps whose peak entry count would fit in HALF the
    current table with `headroom` to spare — hysteresis so the jit
    cache isn't thrashed.

The CUDA reference sizes its buffers dynamically per step (resize-on-
demand inside the rasterizer); this is the static-shape equivalent.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class CapacityController:
    mult: int = 4
    min_mult: int = 2
    max_mult: int = 16
    grow_frac: float = 0.002
    headroom: float = 0.8
    shrink_patience: int = 50
    _fit_streak: int = 0

    # the Pallas expand kernel's f32-exact window math requires
    # capacity < 2^24 (ops/expand.py); never grow past it
    HARD_CAP = (1 << 24) - 1

    def capacity(self, n: int) -> int:
        return min(self.mult * n, self.HARD_CAP)

    def update(self, n: int, n_entries: int, n_dropped: int) -> bool:
        """Feed one step's stats; returns True when the multiplier
        changed (callers re-jit via their capacity-keyed step cache)."""
        cap = self.capacity(n)
        total = n_entries + n_dropped
        if n_dropped > self.grow_frac * max(total, 1):
            self._fit_streak = 0   # overflow always breaks the hysteresis
            if self.mult < self.max_mult and 2 * self.mult * n <= self.HARD_CAP:
                self.mult *= 2
                return True
            return False
        if total <= (cap // 2) * self.headroom:
            self._fit_streak += 1
            if (self._fit_streak >= self.shrink_patience
                    and self.mult > self.min_mult):
                self.mult //= 2
                self._fit_streak = 0
                return True
        else:
            self._fit_streak = 0
        return False
