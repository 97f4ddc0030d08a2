"""Multi-host runtime wiring (parallel/distributed.py): hybrid-mesh
axis/shape logic, the no-op single-process path, and a REAL 2-process
`jax.distributed` smoke test on CPU (local coordinator, gloo
collectives) proving a psum crosses process boundaries — the SURVEY §4d
multi-host test the reference never had."""

import os
import socket
import subprocess
import sys
import textwrap

import jax
import numpy as np
import pytest

from dreamscene_tpu.parallel.distributed import (
    initialize_runtime,
    make_hybrid_mesh,
)


def test_initialize_runtime_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    initialize_runtime()          # must not raise or touch jax.distributed
    assert jax.process_count() == 1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_make_hybrid_mesh_single_process_shape():
    mesh = make_hybrid_mesh(2, 4)
    assert mesh.axis_names == ("ddp", "dp", "tp")
    assert dict(mesh.shape) == {"ddp": 1, "dp": 2, "tp": 4}
    assert mesh.devices.shape == (1, 2, 4)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


_WORKER = textwrap.dedent("""
    import os, sys
    import numpy as np
    import jax
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    sys.path.insert(0, %(repo)r)
    from dreamscene_tpu.parallel.distributed import initialize_runtime
    initialize_runtime()          # reads JAX_* env (the main.py path)
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
    assert jax.process_count() == 2, jax.process_count()
    n_global = jax.device_count()
    mesh = Mesh(np.asarray(jax.devices()).reshape(n_global), ("dp",))
    # each process contributes its local shard; the jitted sum needs a
    # cross-process psum (GSPMD inserts it over the distributed runtime)
    local = jnp.arange(jax.local_device_count(), dtype=jnp.float32) + (
        10.0 * jax.process_index() + 1.0)
    arrs = [jax.device_put(local[i:i + 1], d)
            for i, d in enumerate(jax.local_devices())]
    x = jax.make_array_from_single_device_arrays(
        (n_global,), NamedSharding(mesh, P("dp")), arrs)
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
    print("PSUM_RESULT", float(total), flush=True)
""")


def test_two_process_psum(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER % {"repo": os.getcwd()}],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        ))
    outs = [p.communicate(timeout=150) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
    # devices per process = 2: proc0 contributes 1+2, proc1 contributes
    # 11+12 -> global sum 26 on every process
    for out, _ in outs:
        line = [l for l in out.splitlines() if l.startswith("PSUM_RESULT")]
        assert line and abs(float(line[0].split()[1]) - 26.0) < 1e-6, out
