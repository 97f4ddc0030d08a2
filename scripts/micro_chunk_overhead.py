"""Separate the composite kernels' per-chunk FIXED cost (loop control,
DMA issue/wait, output zero+store) from their math, on the real bench
scene — the structural question ARCHITECTURE.md's "not elementwise-op-
bound" insight left open. Variants:

  * base:  kernels as shipped
  * stub:  TRANSMITTANCE_EPS = +inf -> the `live` gate never fires, so
           ALL chunk math is skipped; what remains is the loop + record
           DMA + (bwd) output zero/store chain = the fixed cost.

Also reports per-tile live-chunk statistics (from the fwd kernel's
row-5 live counter) to size the dead-chunk compaction opportunity for
the backward kernel.

Run on the TPU tunnel: timeout 900 python scripts/micro_chunk_overhead.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _camera
from bench import build_scene, N_GAUSSIANS, WIDTH, HEIGHT
from dreamscene_tpu.ops import composite
from dreamscene_tpu.ops.binning import TILE, bin_splats, cdiv
from dreamscene_tpu.ops.gather import u16_row_gather
from dreamscene_tpu.ops.projection import project_gaussians
from dreamscene_tpu.ops.composite import REC_WIDTH

CHUNK = 384
CAP = 4 * N_GAUSSIANS

scene = build_scene(N_GAUSSIANS)
cam = _camera(WIDTH, HEIGHT)

splats = project_gaussians(
    scene["means3d"], scene["scales"], scene["quats"], scene["opacities"],
    scene["shs"],
    jnp.asarray(cam.world_view_transform), jnp.asarray(cam.full_proj_transform),
    jnp.asarray(cam.camera_center), cam.tanfovx, cam.tanfovy, WIDTH, HEIGHT,
    sh_degree=2,
)
tiles_x = cdiv(WIDTH, TILE)
tiles_y = cdiv(HEIGHT, TILE)
n_tiles = tiles_x * tiles_y

binned = bin_splats(
    splats.means2d, splats.depths, splats.radii, splats.visible,
    WIDTH, HEIGHT, capacity=CAP, chunk=CHUNK,
    conics=splats.conics, opacities=splats.opacities,
)
n = splats.means2d.shape[0]
rec_n = jnp.concatenate(
    [
        splats.means2d, splats.conics, splats.opacities[:, None],
        splats.colors, splats.depths[:, None],
        jnp.zeros((n, REC_WIDTH - 10), jnp.float32),
    ],
    axis=1,
)
cap_pad = cdiv(CAP, 128) * 128 + CHUNK
gid_pad = jnp.concatenate(
    [binned.gid_sorted, jnp.zeros((cap_pad - CAP,), jnp.int32)]
)
records_t = jax.block_until_ready(jnp.transpose(u16_row_gather(rec_n, gid_pad)))
chunks = (binned.chunk_tile, binned.chunk_s0, binned.chunk_lo,
          binned.chunk_hi, binned.chunk_first, binned.n_chunks_used)
chunks = jax.block_until_ready(chunks)
u_used = int(binned.n_chunks_used)
n_chunks = binned.chunk_tile.shape[0]
print(f"u_used={u_used} n_chunks_static={n_chunks} "
      f"n_entries={int(binned.n_entries)} dropped={int(binned.n_dropped)}")


def time_it(fn, iters=10):
    out = jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3, out


def run_pair(tag):
    fwd_ms, out = time_it(
        lambda: composite.composite_forward(
            records_t, *chunks,
            n_tiles=n_tiles, tiles_x=tiles_x, chunk=CHUNK,
        )
    )
    g = jnp.ones_like(out)
    bwd_ms, _ = time_it(
        lambda: composite.composite_backward(
            records_t, *chunks, out, g,
            n_tiles=n_tiles, tiles_x=tiles_x, chunk=CHUNK,
        )
    )
    print(f"{tag}: fwd {fwd_ms:.3f} ms ({fwd_ms/u_used*1e3:.3f} us/chunk)  "
          f"bwd {bwd_ms:.3f} ms ({bwd_ms/u_used*1e3:.3f} us/chunk)")
    return out


out = run_pair("base")

# live-chunk statistics from the fwd live counter (acc row 5)
live_counts = np.asarray(out[:n_tiles, 5, 0])
# chunks per tile from the metadata
ct = np.asarray(binned.chunk_tile)[:u_used]
per_tile = np.bincount(ct, minlength=n_tiles).astype(np.float64)
dead = per_tile - live_counts
print(f"live chunks: {live_counts.sum():.0f} / {per_tile.sum():.0f} "
      f"({100*live_counts.sum()/max(per_tile.sum(),1):.1f}%)  "
      f"dead: {dead.sum():.0f}")
print(f"per-tile chunks p50/p90/max: {np.percentile(per_tile,50):.0f}/"
      f"{np.percentile(per_tile,90):.0f}/{per_tile.max():.0f}   "
      f"live p50/p90/max: {np.percentile(live_counts,50):.0f}/"
      f"{np.percentile(live_counts,90):.0f}/{live_counts.max():.0f}")

# stub: skip all chunk math via the live gate
composite._STUB_MATH = True
jax.clear_caches()
run_pair("stub(no math)")
