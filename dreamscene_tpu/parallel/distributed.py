"""Multi-host (pod-slice) runtime wiring: jax.distributed + hybrid
DCN/ICI meshes.

The reference has no distributed runtime at all (its two-GPU split is a
host-side model-placement trick, SURVEY.md §2 parallelism inventory); the
TPU build defines one. Design (BASELINE.json north star / scaling-book
recipe):

  * one JAX process per host, `jax.distributed.initialize` for the
    cross-host runtime (coordinator discovery, DCN collectives, barrier);
  * mesh axes laid out so the *outermost* axis maps to DCN (data
    parallelism between pod slices — one psum of parameter grads per
    step) and the inner axes ride ICI ("dp" cameras, "tp"
    splats+tile-bands, which all_gather projected records every
    microstep and must stay on ICI);
  * checkpoint/restore stays host-local (each host writes its param
    shard via orbax-style npz; see training/*_trainer.py resume paths),
    so a preempted pod restarts idempotently.

On a single host all of this degrades to the plain `make_mesh` layout —
`initialize_runtime()` is a no-op unless `num_processes > 1` is
requested via env/args, so the same trainer script runs everywhere.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.sharding import Mesh

log = logging.getLogger(__name__)


def initialize_runtime(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bring up the cross-host JAX runtime. Call once, before any other
    JAX API touches devices (mirrors jax.distributed contract).

    With no args, reads the standard env (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID — also auto-populated on Cloud TPU
    pods) and no-ops for single-process runs so local CLI usage is
    unchanged.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or int(
        os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    if process_id is None and os.environ.get("JAX_PROCESS_ID") is not None:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        log.info(
            "jax.distributed up: process %d/%d, %d local + %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    elif coordinator_address:
        # Cloud TPU pod: jax.distributed can infer everything
        jax.distributed.initialize()
        log.info("jax.distributed up (auto): process %d/%d",
                 jax.process_index(), jax.process_count())


def make_hybrid_mesh(n_dp: int, n_tp: int, dcn_dp: int | None = None) -> Mesh:
    """("ddp", "dp", "tp") mesh with the leading data-parallel axis over
    DCN (slice-to-slice) and dp x tp within each ICI domain.

    dcn_dp defaults to jax.process_count() when the global device count
    is a multiple of (n_dp * n_tp) per process group, else 1. Uses
    mesh_utils.create_hybrid_device_mesh so DCN-adjacent devices land on
    the outer axis; per the scaling book only the once-per-step parameter
    psum crosses DCN — the per-camera record all_gather stays on ICI.
    """
    from jax.experimental import mesh_utils

    n_inner = n_dp * n_tp
    if dcn_dp is None:
        dcn_dp = max(1, jax.device_count() // max(n_inner, 1))
        dcn_dp = min(dcn_dp, jax.process_count())
    if dcn_dp > 1:
        dev = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, n_dp, n_tp),
            dcn_mesh_shape=(dcn_dp, 1, 1),
        )
    else:
        assert jax.device_count() >= n_inner, (jax.device_count(), n_inner)
        dev = np.asarray(jax.devices()[:n_inner]).reshape(1, n_dp, n_tp)
    return Mesh(dev, ("ddp", "dp", "tp"))
