"""Profiling/observability helpers (SURVEY.md §5: the reference has none;
the TPU build needs them to chase the speed-of-light HBM target)."""

from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger("dreamscene_tpu")


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with xprof/tensorboard."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(name: str, sync=None):
    """Wall-clock block timer; pass a pytree to block_until_ready on."""
    import jax

    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        logger.info("%s: %.2f ms", name, (time.perf_counter() - t0) * 1e3)


def roofline(flops: float, bytes_moved: float, seconds: float,
             peak_flops: float = 197e12, peak_bw: float = 819e9) -> dict:
    """Roofline summary for one v5e chip (bf16 peak 197 TFLOP/s,
    HBM 819 GB/s)."""
    achieved_flops = flops / seconds
    achieved_bw = bytes_moved / seconds
    return {
        "achieved_tflops": achieved_flops / 1e12,
        "flops_frac": achieved_flops / peak_flops,
        "achieved_gbps": achieved_bw / 1e9,
        "bw_frac": achieved_bw / peak_bw,
        "arithmetic_intensity": flops / max(bytes_moved, 1),
    }


def seed_everything(seed: int):
    """Global seeding (reference: training/object_trainer.py:59-72)."""
    import os
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
