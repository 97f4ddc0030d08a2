"""Pallas TPU kernel: ragged entry expansion for tile binning.

Replaces the XLA scatter+cumsum "segmented broadcast" of binning step 3
(and the separate per-splat geo gather) with one kernel. XLA's TPU
scatter on the [capacity,3] delta table measured 13.1 ms at 300K->1.2M
(layout-transposed row writes); this kernel does the same job in well
under 1 ms of MXU time.

Problem: splat r (depth-rank order) owns the contiguous entry run
[offsets[r], offsets[r] + count[r]); for every entry e < capacity we
need its owner's rank, packed tile-rect descriptor (basenx), run start
(offs) and original splat id (gid), from which the per-entry sort key
`tile << shift | rank` is formed.

Key structure (all from `offsets` being sorted):
  * entries are processed in blocks of B; the owners of a block's
    entries live in a CONTIGUOUS splat window of <= B+1 rows whose
    start is found host-side with one small searchsorted;
  * within the window, owner recovery is a STEP-FUNCTION sum:
    x_owner(e) = x_base + sum_w [offsets_w <= e] * delta_x_w, so ONE
    [8,128]x[B,128]^T MXU matmul per live 128-splat window slice
    reconstructs (rank, basenx, offs, gid) for all B entries at once.
    Products are exact: deltas are ints < 2^24 in f32 and the mask is
    0/1, so the f32 accumulation is error-free (values stay < 2^24,
    asserted via capacity).
  * the final key/tile arithmetic runs on dense [1, B] lane vectors;
    integer division by the dynamic rect width uses exact f32
    reciprocal-free division (operands < 2^19, quotient ulp << 1/b).

Reference contract: the CUDA rasterizer's duplicate-keys kernel
(diff-gaussian-rasterization duplicateWithKeys, SURVEY.md §2.9.1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W_ROWS = 8        # rows: offsets, d_basenx, d_offs, d_gid, ones, 3 capsule
EXPAND_NBUF = 2   # window-stream double buffering
CAP_PAD = 0.3     # cull-test half-extent padding beyond (tile/2 - 0.5) px,
                  # absorbing the 0.5-px quantized ellipse mid (+-0.25)


def _expand_kernel(
    # scalar prefetch
    w0a_ref, wlive_ref, base_ref, nent_ref,
    # inputs
    win_hbm,
    # outputs
    key_hbm, gid_hbm,
    # scratch
    wbuf_ref, wsem_ref, kbuf_ref, gbuf_ref, osem_ref,
    *, block, wsize, n, n_tiles, tiles_x, shift, rank_drop, use_cull,
    tile_w, tile_h,
):
    n_blocks = w0a_ref.shape[0]

    def win_dma(slot, b):
        return pltpu.make_async_copy(
            win_hbm.at[:, pl.ds(pl.multiple_of(w0a_ref[b], 128), wsize)],
            wbuf_ref.at[slot],
            wsem_ref.at[slot],
        )

    for w in range(EXPAND_NBUF - 1):
        @pl.when(w < n_blocks)
        def _():
            win_dma(w, w).start()

    def body(b, _):
        slot = jax.lax.rem(b, EXPAND_NBUF)

        @pl.when(b + EXPAND_NBUF - 1 < n_blocks)
        def _():
            win_dma(jax.lax.rem(b + EXPAND_NBUF - 1, EXPAND_NBUF),
                    b + EXPAND_NBUF - 1).start()

        win_dma(slot, b).wait()

        # entry ids of this block as a [block, 1]-ish broadcast source and
        # a [1, block] lane vector for the final arithmetic
        e0 = (b * block).astype(jnp.float32)
        e_sub = e0 + jax.lax.broadcasted_iota(
            jnp.int32, (block, 128), 0).astype(jnp.float32)  # [B, 128]

        def wstep(k, acc):
            w = wbuf_ref[slot, :, pl.ds(k * 128, 128)]       # [8, 128]
            mask = (w[0:1, :] <= e_sub).astype(jnp.float32)  # [B, 128]
            # HIGHEST precision is CORRECTNESS here, not accuracy: the
            # window rows are integers up to 2^24 and the TPU's default
            # single-pass bf16 MXU rounds them (8-bit mantissa) —
            # measured: every sorted entry wrong on the real chip while
            # CPU interpret was exact. Multi-pass f32 keeps int products
            # < 2^24 exact. A 3-way bf16 split (3 passes instead of
            # HIGHEST's 6, exactness provable on paper and verified
            # exact in interpret mode) was tried in round 3 and
            # CORRUPTED the full-scale compiled kernel (tpu_parity
            # img p999 0.79 vs interpret; mid-size green) — Mosaic's
            # compiled bf16 convert/dot rounding breaks an assumption
            # the proof makes. Do not retry without a full-scale
            # on-chip parity run in hand.
            return acc + jax.lax.dot_general(
                w, mask, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                                # [8, B]

        acc = jax.lax.fori_loop(
            0, wlive_ref[b], wstep,
            jnp.zeros((W_ROWS, block), jnp.float32), unroll=False,
        )

        # acc rows: 0 = unused (offsets row summed by mask — ignore),
        # 1..3 = masked delta sums; count of mask-true rows is row 4
        # (ones); 5..7 = capsule channel delta sums (use_cull).
        # Reconstruct absolute values.
        w0a_f = w0a_ref[b].astype(jnp.float32)
        drank = (w0a_f - 1.0) + acc[4:5, :]                  # [1, B]
        basenx = base_ref[b, 0].astype(jnp.float32) + acc[1:2, :]
        offs = base_ref[b, 1].astype(jnp.float32) + acc[2:3, :]
        gid = base_ref[b, 2].astype(jnp.float32) + acc[3:4, :]

        e_row = e0 + jax.lax.broadcasted_iota(
            jnp.int32, (1, block), 1).astype(jnp.float32)
        slot_e = e_row - offs
        base_t = jnp.floor(basenx * (1.0 / 256.0))
        gnx = jnp.maximum(basenx - base_t * 256.0, 1.0)
        qy = jnp.floor(slot_e / gnx)
        tile = base_t + qy * jnp.float32(tiles_x) + (slot_e - qy * gnx)
        valid = e_row < nent_ref[0].astype(jnp.float32)

        if use_cull:
            # conservative capsule+circle cull (see binning
            # _capsule_params): entries whose tile cannot reach
            # alpha >= 1/255 are re-keyed to the trash tile. All three
            # channels are exact integers reconstructed by the window
            # matmul; unpack is exact (power-of-two divides).
            ch0 = base_ref[b, 3].astype(jnp.float32) + acc[5:6, :]
            ch1 = base_ref[b, 4].astype(jnp.float32) + acc[6:7, :]
            ch2 = base_ref[b, 5].astype(jnp.float32) + acc[7:8, :]
            e0c = jnp.floor(ch0 * (1.0 / 4096.0))
            midx = (e0c - 2048.0) * 0.5
            midy = (ch0 - e0c * 4096.0 - 2048.0) * 0.5
            e1c = jnp.floor(ch1 * (1.0 / 4096.0))
            vx = (e1c - 2048.0) * 0.5
            vy = (ch1 - e1c * 4096.0 - 2048.0) * 0.5
            e2c = jnp.floor(ch2 * (1.0 / 4096.0))
            big_b = e2c * 0.5
            no_cull = (ch2 - e2c * 4096.0) > 0.5
            ty = jnp.floor(tile * (1.0 / jnp.float32(tiles_x)))
            tx = tile - ty * jnp.float32(tiles_x)
            dx = tx * jnp.float32(tile_w) + (tile_w / 2.0 - 0.5) - midx
            dy = ty * jnp.float32(tile_h) + (tile_h / 2.0 - 0.5) - midy
            v2 = vx * vx + vy * vy
            av = jnp.abs(vx) + jnp.abs(vy)
            dotv = dx * vx + dy * vy
            dotn = dy * vx - dx * vy
            # EXACT ellipse-vs-tile box-min, sqrt-free from (v, B):
            # the level set Q(d) = tq is E(d) = 1 with
            #   E(d) = (v.d)^2/v2^2 + (v x d)^2/(v2*B^2),  v2 = |v|^2.
            # Min of the PD quadratic E over the (enlarged) tile box:
            # 0 if the mid lies inside, else the min over the four
            # edges, each a 1D quadratic clamped at its vertex. A and B
            # are quantized UP and the per-axis box half-extents are
            # padded by CAP_PAD beyond (tile/2 - 0.5) px (absorbing the
            # 0.5-px mid grid), so cull keeps a strict superset of the
            # kernel's nonzero entries.
            v2g = jnp.maximum(v2, 0.25)
            iv2 = 1.0 / v2g
            ib2 = 1.0 / jnp.maximum(big_b * big_b, 0.25)
            ea = (vx * vx * iv2 + vy * vy * ib2) * iv2
            eb = (vx * vy * iv2 - vx * vy * ib2) * iv2
            ec = (vy * vy * iv2 + vx * vx * ib2) * iv2
            hwx = tile_w / 2.0 - 0.5 + CAP_PAD
            hwy = tile_h / 2.0 - 0.5 + CAP_PAD
            lxe = dx - hwx
            uxe = dx + hwx
            lye = dy - hwy
            uye = dy + hwy
            inside = (lxe <= 0.0) & (uxe >= 0.0) & (lye <= 0.0) & (uye >= 0.0)

            def emin_edge_x(cst):
                dye = jnp.clip(-eb * cst / jnp.maximum(ec, 1e-30), lye, uye)
                return ea * cst * cst + 2.0 * eb * cst * dye + ec * dye * dye

            def emin_edge_y(cst):
                dxe = jnp.clip(-eb * cst / jnp.maximum(ea, 1e-30), lxe, uxe)
                return ea * dxe * dxe + 2.0 * eb * dxe * cst + ec * cst * cst

            emin = jnp.minimum(
                jnp.minimum(emin_edge_x(lxe), emin_edge_x(uxe)),
                jnp.minimum(emin_edge_y(lye), emin_edge_y(uye)),
            )
            emin = jnp.where(inside, 0.0, emin)
            # rotation-aware threshold: quantizing v rotates the
            # reconstructed major axis by eps <= ~0.71/|v|, which
            # inflates E at true-ellipse points by up to
            # A^2*eps^2/B^2 ~= 0.5/B^2 for needle splats — keep any
            # entry within that bound (plus fp slop)
            thresh = 1.001 + 0.55 * ib2
            valid = valid & (no_cull | (emin <= thresh))

        tile_i = jnp.where(valid, tile.astype(jnp.int32), n_tiles)
        drank_i = jnp.clip(drank.astype(jnp.int32), 0, n - 1)
        gid_i = jnp.clip(gid.astype(jnp.int32), 0, n - 1)

        oslot = jax.lax.rem(b, 2)

        @pl.when(b >= 2)
        def _():
            for r, buf in ((0, kbuf_ref), (1, gbuf_ref)):
                pltpu.make_async_copy(
                    buf.at[oslot],
                    (key_hbm if r == 0 else gid_hbm).at[
                        :, pl.ds((b - 2) * block, block)],
                    osem_ref.at[oslot, r],
                ).wait()

        # rank_drop > 0: low rank bits leave the key (see binning —
        # stable sort + rank-major expansion keeps exact depth order)
        kbuf_ref[oslot] = (tile_i << shift) | (drank_i >> rank_drop)
        gbuf_ref[oslot] = gid_i
        pltpu.make_async_copy(
            kbuf_ref.at[oslot], key_hbm.at[:, pl.ds(b * block, block)],
            osem_ref.at[oslot, 0],
        ).start()
        pltpu.make_async_copy(
            gbuf_ref.at[oslot], gid_hbm.at[:, pl.ds(b * block, block)],
            osem_ref.at[oslot, 1],
        ).start()
        return ()

    jax.lax.fori_loop(0, n_blocks, body, (), unroll=False)

    for k in range(min(2, n_blocks)):
        b = n_blocks - 1 - k
        for r, buf in ((0, kbuf_ref), (1, gbuf_ref)):
            pltpu.make_async_copy(
                buf.at[b % 2],
                (key_hbm if r == 0 else gid_hbm).at[
                    :, pl.ds(b * block, block)],
                osem_ref.at[b % 2, r],
            ).wait()


@functools.partial(
    jax.jit,
    static_argnames=("capacity", "n", "n_tiles", "tiles_x", "shift",
                     "rank_drop", "block", "interpret", "tile_w", "tile_h"),
)
def expand_entries(
    offsets: jnp.ndarray,    # [N] i32 exclusive entry offsets, rank order
    basenx: jnp.ndarray,     # [N] i32 packed (tile0*256 + nx), rank order
    perm: jnp.ndarray,       # [N] i32 rank -> original splat id
    n_entries: jnp.ndarray,  # [] i32
    capacity: int,
    n: int,
    n_tiles: int,
    tiles_x: int,
    shift: int,
    rank_drop: int = 0,
    caps: tuple | None = None,   # 3 x [N] i32 capsule channel columns
    block: int = 2048,
    interpret: bool = False,
    tile_w: int = 16,
    tile_h: int = 16,
):
    """Per-entry (sort_key, original splat id) for all `capacity` entries.

    sort_key = tile << shift | rank (i32; caller asserts it fits);
    invalid entries (e >= n_entries) get tile == n_tiles.
    """
    assert capacity < (1 << 24), "f32-exact window math needs cap < 2^24"
    assert block % 128 == 0
    n_blocks = -(-capacity // block)
    cap_pad = n_blocks * block
    wsize = block + 256

    # window table [8, N_pad] f32: row 0 absolute offsets (clamped to
    # capacity so overflow rows never match), rows 1-3 deltas vs the
    # previous rank, row 4 ones (mask row-count -> rank). All values are
    # ints < 2^24, exact in f32.
    offs_c = jnp.minimum(offsets, capacity).astype(jnp.float32)

    def delta(v):
        # differences in i32 (exact even when absolutes exceed 2^24),
        # then to f32: |delta| < 2^19 is exactly representable
        d = jnp.concatenate([v[:1], v[1:] - v[:-1]])
        return d.astype(jnp.float32)

    n_pad = (-(-n // 128)) * 128 + wsize
    row_list = [offs_c, delta(basenx), delta(offsets), delta(perm),
                jnp.ones((n,), jnp.float32)]
    use_cull = caps is not None
    if use_cull:
        row_list += [delta(caps[j]) for j in range(3)]
    rows = jnp.stack(row_list, axis=0)                       # [5 or 8, N]
    win = jnp.zeros((W_ROWS, n_pad), jnp.float32)
    win = jax.lax.dynamic_update_slice(win, rows, (0, 0))
    # pad offsets row with capacity so guard rows never enter the mask
    win = win.at[0, n:].set(jnp.float32(capacity))

    # per-block window placement (tiny searchsorteds over the block grid)
    bstarts = jnp.arange(n_blocks, dtype=jnp.int32) * block
    ws0 = jnp.maximum(
        jnp.searchsorted(offsets, bstarts, side="right").astype(jnp.int32)
        - 1, 0)
    w0a = (ws0 // 128) * 128
    ws_end = jnp.searchsorted(
        offsets, bstarts + (block - 1), side="right").astype(jnp.int32)
    wlive = jnp.clip(-(-(ws_end - w0a) // 128), 1, wsize // 128)
    base_idx = jnp.maximum(w0a - 1, 0)
    zero_base = (w0a == 0)
    base_cols = [jnp.where(zero_base, 0, basenx[base_idx]),
                 jnp.where(zero_base, 0, offsets[base_idx]),
                 jnp.where(zero_base, 0, perm[base_idx])]
    if use_cull:
        base_cols += [jnp.where(zero_base, 0, caps[j][base_idx])
                      for j in range(3)]
    else:
        base_cols += [jnp.zeros_like(base_cols[0])] * 3
    base = jnp.stack(base_cols, axis=1).astype(jnp.int32)   # [n_blocks, 6]

    kernel = functools.partial(
        _expand_kernel, block=block, wsize=wsize, n=n, n_tiles=n_tiles,
        tiles_x=tiles_x, shift=shift, rank_drop=rank_drop,
        use_cull=use_cull, tile_w=tile_w, tile_h=tile_h,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((EXPAND_NBUF, W_ROWS, wsize), jnp.float32),
            pltpu.SemaphoreType.DMA((EXPAND_NBUF,)),
            pltpu.VMEM((2, 1, block), jnp.int32),
            pltpu.VMEM((2, 1, block), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    key, gid = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, cap_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, cap_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        interpret=interpret,
    )(w0a, wlive, base, n_entries.reshape(1).astype(jnp.int32), win)
    return key[0, :capacity], gid[0, :capacity]
