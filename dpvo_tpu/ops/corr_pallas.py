"""Pallas TPU kernel for the patch-correlation lookup.

The XLA reference path (ops.corr) evaluates the (2R+2)^2 tap grid as a
scan of 64 row-gathers from HBM.  This kernel instead keeps one whole
feature-map frame resident in VMEM per grid step and computes every tap
of every edge targeting that frame with on-chip dot products:

- edges are tiled by target frame (the engine keeps its edge table
  grouped by ``jj``); ``tile_frame`` scalar-prefetch drives the fmap
  BlockSpec index_map, and Mosaic's pipeliner only re-DMAs the frame when
  the index changes;
- feature maps are stored zero-padded (PAD on the left/top, and the W
  axis rounded up so every aligned 16-wide window stays in bounds), so
  every tap window is an in-bounds VMEM slice and out-of-image taps read
  zeros — bit-identical to the CUDA kernel's bounds masking
  (correlation_kernel.cu:123) with no in-kernel branches;
- Mosaic requires the dynamic W-offset of a vector load to be 8-aligned,
  so the kernel loads a 16-wide window at ``x0 = 8*floor(bx/8)`` and
  folds the sub-window selection (residue ``r = bx - x0``) together with
  the bilinear x-blend into a dynamically constructed (16, 7) selection
  matrix — no unaligned loads, no in-register dynamic slices;
- all per-(edge, pixel) metadata lives in SMEM and is read as scalars,
  so every vector op is a lane-aligned broadcast with no relayouts; the
  channel dot runs on the VPU (measured faster than MXU mat-vecs at
  these shapes, and exact in f32).

HBM traffic per level drops from O(E * 64 * 9 * C) gathered rows to
(#frames * frame_bytes + E * 9 * C).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 8        # zero border on top/left/bottom (and at least PAD on right)
R = 3          # correlation radius (2R+2 = 8 tap rows/cols)
D = 2 * R + 2  # tap window size
DW = 16        # aligned load width (covers the 8 taps at any residue)
P2 = 9         # patch pixels (3x3)
TILE = 16      # edges per grid step

# Default fused-kernel variant.  v13 (v12 + in-kernel gmap-ring gather
# + fused corr-encoder first matmul, engine path only) measured
# 12.95 ms vs 13.55 for the full v12 pipeline (gather + kernel +
# matmul) at E=49152 on TPU v5e, maxrel 1.6e-3 vs the v12 pipeline
# (inside the reference's fp16 corr gate).  v12 (MXU channel dot on
# the raw 16-wide bf16 windows, residue select folded into the batched
# blends) measured 21.8 (v9) -> 14.1 (v10) -> 11.7 ms/call standalone
# and matches v4 to maxrel ~1e-7 on hardware.  v9 (batched blends,
# VPU dot) is bit-identical to v4 — set DPVO_CORR_VERSION=9 for
# exact-f32 correlation, =4 if a toolchain rejects the newer layouts,
# =12 to disable the v13 fusions.
FUSED_VERSION = int(os.environ.get("DPVO_CORR_VERSION", "13"))


def padded_hw(H, W):
    """Padded frame dims: PAD border, W rounded up to a multiple of 8."""
    Wp = W + 2 * PAD
    return H + 2 * PAD, Wp + (-Wp % 8)


def pad_fmap(fmap):
    """(F, H, W, C) -> (F, Hp, Wp, C) zero-padded (see padded_hw)."""
    F, H, W, C = fmap.shape
    Hp, Wp = padded_hw(H, W)
    return jnp.pad(fmap, ((0, 0), (PAD, Hp - H - PAD),
                          (PAD, Wp - W - PAD), (0, 0)))


def _kernel(tile_frame_ref, nlive_ref, x0_ref, y0_ref, ri_ref, dx_ref,
            dy_ref, g_ref, fmap_ref, out_ref):
    """One tile: TILE edges against one VMEM-resident frame.

    All per-(edge, pixel) metadata lives in SMEM and is read as scalars,
    so every vector op is a plain lane-aligned broadcast — no Mosaic
    relayouts.  Dead tail tiles write zeros (see _kernel_v3).
    """
    f32 = jnp.float32
    i32 = jnp.int32

    @pl.when(pl.program_id(0) >= nlive_ref[0])
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(pl.program_id(0) < nlive_ref[0])
    def _():
        # static iota planes for the x select+blend matrix (DW, D-1)
        rows = jax.lax.broadcasted_iota(i32, (DW, D - 1), 0)
        cols = jax.lax.broadcasted_iota(i32, (DW, D - 1), 1)

        for e in range(TILE):
            for p in range(P2):
                y0 = y0_ref[e, p]
                x0 = pl.multiple_of(x0_ref[e, p], 8)
                win = fmap_ref[0, pl.ds(y0, D), pl.ds(x0, DW), :]
                g = g_ref[e, p].astype(f32)                    # (C,)

                # channel dot on the VPU: lane-aligned broadcast+reduce
                taps = jnp.sum(win.astype(f32) * g[None, None, :],
                               axis=2)                         # (8, 16)

                # y bilinear blend (static slices, scalar weights)
                dyv = dy_ref[e, p]
                ty = (1 - dyv) * taps[:-1, :] + dyv * taps[1:, :]

                # x select + blend folded into one (16, 7) matrix:
                # Bx[k, j] = (1-dx) at k=r+j, dx at k=r+j+1
                dxv = dx_ref[e, p]
                rr = ri_ref[e, p]
                bx_mat = (jnp.where(rows == cols + rr, 1.0 - dxv, 0.0)
                          + jnp.where(rows == cols + rr + 1, dxv, 0.0))

                # exact f32 blend on the VPU (an MXU dot bf16-rounds)
                out_ref[e, p] = jnp.sum(
                    ty[:, :, None] * bx_mat[None, :, :],
                    axis=1).astype(out_ref.dtype)              # (7, 7)


def _kernel_v3(tile_frame_ref, nlive_ref, x0_ref, y0_ref, ri_ref, dx_ref,
               dy_ref, g_ref, fmap_ref, out_ref):
    """Like ``_kernel`` but the dynamic x-residue selection happens
    BEFORE the channel dot via a sublane rotate (``pltpu.roll`` with a
    dynamic shift), so the multiply + lane-reduce run on an 8-wide
    window instead of 16 — ~2x less VPU work per (edge, pixel).

    Tiles past ``nlive_ref[0]`` hold only dead rows (stale edge-table
    slots grouped to the tail by corr_grouping_device's valid mask) and
    write zeros instead of running the 144-iteration body — at the
    bench operating point ~20% of the grid is dead padding."""
    f32 = jnp.float32

    @pl.when(pl.program_id(0) >= nlive_ref[0])
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(pl.program_id(0) < nlive_ref[0])
    def _():
        # static iota planes for the (8, 7) x-blend matrix (residue
        # already folded out by the rotate)
        rows = jax.lax.broadcasted_iota(jnp.int32, (D, D - 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (D, D - 1), 1)

        for e in range(TILE):
            for p in range(P2):
                y0 = y0_ref[e, p]
                x0 = pl.multiple_of(x0_ref[e, p], 8)
                win = fmap_ref[0, pl.ds(y0, D), pl.ds(x0, DW), :]
                rr = ri_ref[e, p]
                # win8[j] = win[rr + j]: rotate x left by rr, keep 8
                # (dynamic rotate needs 32-bit data; the f32 convert is
                # paid by the exact-f32 dot either way)
                win8 = pltpu.roll(win.astype(f32), -rr,
                                  axis=1)[:, :D, :]            # (8,8,C)
                g = g_ref[e, p].astype(f32)                    # (C,)

                taps = jnp.sum(win8 * g[None, None, :], axis=2)

                dyv = dy_ref[e, p]
                ty = (1 - dyv) * taps[:-1, :] + dyv * taps[1:, :]

                dxv = dx_ref[e, p]
                bx_mat = (jnp.where(rows == cols, 1.0 - dxv, 0.0)
                          + jnp.where(rows == cols + 1, dxv, 0.0))

                out_ref[e, p] = jnp.sum(
                    ty[:, :, None] * bx_mat[None, :, :],
                    axis=1).astype(out_ref.dtype)              # (7, 7)


def _kernel_fused(tile_frame_ref, nlive_ref,
                  x0a_ref, y0a_ref, ria_ref, dxa_ref, dya_ref,
                  x0b_ref, y0b_ref, rib_ref, dxb_ref, dyb_ref,
                  g_ref, fmap1_ref, fmap2_ref, out_ref):
    """Both pyramid levels in one grid pass: per (edge, pixel) the g row
    is loaded once and the two levels' tap/blend chains interleave,
    doubling instruction-level parallelism for the VPU pipeline and
    halving the per-call/grid overheads of two separate kernels.

    out (TILE, 2, P2, 7, 7) in the raw (level, p, dy, dx) order that
    raw_to_ref_perm maps onto the corr encoder's kernel rows."""
    f32 = jnp.float32

    @pl.when(pl.program_id(0) >= nlive_ref[0])
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(pl.program_id(0) < nlive_ref[0])
    def _():
        rows = jax.lax.broadcasted_iota(jnp.int32, (D, D - 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (D, D - 1), 1)

        def taps77(fmap_ref, x0_ref, y0_ref, ri_ref, dx_ref, dy_ref,
                   e, p, g):
            y0 = y0_ref[e, p]
            x0 = pl.multiple_of(x0_ref[e, p], 8)
            win = fmap_ref[0, pl.ds(y0, D), pl.ds(x0, DW), :]
            rr = ri_ref[e, p]
            win8 = pltpu.roll(win.astype(f32), -rr,
                              axis=1)[:, :D, :]                # (8,8,C)
            taps = jnp.sum(win8 * g[None, None, :], axis=2)    # (8, 8)
            dyv = dy_ref[e, p]
            ty = (1 - dyv) * taps[:-1, :] + dyv * taps[1:, :]
            dxv = dx_ref[e, p]
            bx_mat = (jnp.where(rows == cols, 1.0 - dxv, 0.0)
                      + jnp.where(rows == cols + 1, dxv, 0.0))
            return jnp.sum(ty[:, :, None] * bx_mat[None, :, :],
                           axis=1)                             # (7, 7)

        for e in range(TILE):
            for p in range(P2):
                g = g_ref[e, p].astype(f32)                    # (C,)
                out_ref[e, 0, p] = taps77(
                    fmap1_ref, x0a_ref, y0a_ref, ria_ref, dxa_ref,
                    dya_ref, e, p, g).astype(out_ref.dtype)
                out_ref[e, 1, p] = taps77(
                    fmap2_ref, x0b_ref, y0b_ref, rib_ref, dxb_ref,
                    dyb_ref, e, p, g).astype(out_ref.dtype)


def _kernel_fused_v5(tile_frame_ref, nlive_ref,
                     x0a_ref, y0a_ref, ria_ref, dxa_ref, dya_ref,
                     x0b_ref, y0b_ref, rib_ref, dxb_ref, dyb_ref,
                     g_ref, fmap1_ref, fmap2_ref, out_ref):
    """Fused two-level kernel, v5 dot ordering: the channel dot runs on
    the full 16-wide aligned window (no data-sized rotate), and the
    dynamic x-residue selection becomes a single-register lane roll of
    the small (8, 16) taps array — the v3 ordering rotates the whole
    (8, 16, C) window (f32, ~2x the dot's own op count) before an 8-wide
    dot; v5 pays 2x dot width to shrink the rotate to one vreg."""
    f32 = jnp.float32

    @pl.when(pl.program_id(0) >= nlive_ref[0])
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(pl.program_id(0) < nlive_ref[0])
    def _():
        rows = jax.lax.broadcasted_iota(jnp.int32, (D, D - 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (D, D - 1), 1)

        def taps77(fmap_ref, x0_ref, y0_ref, ri_ref, dx_ref, dy_ref,
                   e, p, g):
            y0 = y0_ref[e, p]
            x0 = pl.multiple_of(x0_ref[e, p], 8)
            win = fmap_ref[0, pl.ds(y0, D), pl.ds(x0, DW), :]
            taps16 = jnp.sum(win.astype(f32) * g[None, None, :],
                             axis=2)                           # (8, 16)
            rr = ri_ref[e, p]
            taps = pltpu.roll(taps16, -rr, axis=1)[:, :D]      # (8, 8)
            dyv = dy_ref[e, p]
            ty = (1 - dyv) * taps[:-1, :] + dyv * taps[1:, :]
            dxv = dx_ref[e, p]
            bx_mat = (jnp.where(rows == cols, 1.0 - dxv, 0.0)
                      + jnp.where(rows == cols + 1, dxv, 0.0))
            return jnp.sum(ty[:, :, None] * bx_mat[None, :, :],
                           axis=1)                             # (7, 7)

        for e in range(TILE):
            for p in range(P2):
                g = g_ref[e, p].astype(f32)                    # (C,)
                out_ref[e, 0, p] = taps77(
                    fmap1_ref, x0a_ref, y0a_ref, ria_ref, dxa_ref,
                    dya_ref, e, p, g).astype(out_ref.dtype)
                out_ref[e, 1, p] = taps77(
                    fmap2_ref, x0b_ref, y0b_ref, rib_ref, dxb_ref,
                    dyb_ref, e, p, g).astype(out_ref.dtype)


def _kernel_fused_v9(tile_frame_ref, nlive_ref,
                     x0a_ref, y0a_ref, ria_ref,
                     x0b_ref, y0b_ref, rib_ref,
                     dx_ref, dy_ref,
                     g_ref, fmap1_ref, fmap2_ref, out_ref, taps_ref):
    """Fused two-level kernel, v9: per-(edge, pixel) work stops at the
    rolled channel dot (full-width vregs); the raw (8, 8) taps land in a
    VMEM scratch and BOTH bilinear blends run once per tile as batched
    full-width vector ops with static slices.

    Rationale (scripts/dev/corr_variants.py probes at E=49k): the v4
    kernel spends ~13.4 ms of its 27.0 ms in the per-(edge, pixel)
    blend chain — dozens of vector instructions on (8, 8)/(7, 7) arrays
    that use ~6% of the VPU lanes.  Batching the blends over the whole
    (TILE, 2, P2) tile turns them into ~30 full-width instructions.
    Keeping the per-pixel roll (vs folding the residue into the blend,
    v6b) is what makes the batched x-blend STATIC: after the roll every
    row's window starts at tap 0, so the blend is two FMAs on adjacent
    static slices.  Bit-identical to v4: same dot, and the (16, 7)
    blend matmul's zero terms add exactly +0.0 in f32.
    """
    f32 = jnp.float32

    @pl.when(pl.program_id(0) >= nlive_ref[0])
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(pl.program_id(0) < nlive_ref[0])
    def _():
        def taps8(fmap_ref, x0_ref, y0_ref, ri_ref, e, p, g):
            y0 = y0_ref[e, p]
            x0 = pl.multiple_of(x0_ref[e, p], 8)
            win = fmap_ref[0, pl.ds(y0, D), pl.ds(x0, DW), :]
            win8 = pltpu.roll(win.astype(f32), -ri_ref[e, p],
                              axis=1)[:, :D, :]                # (8,8,C)
            return jnp.sum(win8 * g[None, None, :], axis=2)    # (8, 8)

        for e in range(TILE):
            for p in range(P2):
                g = g_ref[e, p].astype(f32)                    # (C,)
                taps_ref[e, 0, p] = taps8(
                    fmap1_ref, x0a_ref, y0a_ref, ria_ref, e, p, g)
                taps_ref[e, 1, p] = taps8(
                    fmap2_ref, x0b_ref, y0b_ref, rib_ref, e, p, g)

        taps = taps_ref[...]                         # (TILE, 2, P2, 8, 8)
        # dx/dy arrive pre-expanded to (TILE, 2, P2, 1, 1): Mosaic's
        # infer-vector-layout rejects the in-kernel (16,2,9) ->
        # (16,2,9,1,1) shape cast a [:, :, :, None, None] would need.
        dyv = dy_ref[...]                            # (TILE, 2, P2, 1, 1)
        ty = ((1.0 - dyv) * taps[:, :, :, :D - 1, :]
              + dyv * taps[:, :, :, 1:, :])          # (TILE, 2, P2, 7, 8)
        dxv = dx_ref[...]
        out = ((1.0 - dxv) * ty[..., :D - 1]
               + dxv * ty[..., 1:])                  # (TILE, 2, P2, 7, 7)
        out_ref[...] = out.astype(out_ref.dtype)


def _kernel_fused_v10(tile_frame_ref, nlive_ref,
                      x0a_ref, y0a_ref, ria_ref,
                      x0b_ref, y0b_ref, rib_ref,
                      dx2_ref, dy2_ref,
                      g_ref, fmap1_ref, fmap2_ref, out_ref, taps_ref):
    """Fused two-level kernel, v10: the channel dot runs on the MXU.

    Per (edge, pixel) both levels' rolled bf16 windows stack into one
    (128 taps, C) matrix and ONE dot_general against the g row computes
    all 128 taps — the VPU stops doing the 56-op lane reduction that was
    ~60% of v9's issue count and only handles loads, converts, rolls and
    the batched blends.  bf16 x bf16 -> f32 MXU products are exact
    (bf16 has fewer mantissa bits than the f32 multiply consumes); only
    the f32 ACCUMULATION ORDER differs from v9 (systolic chain vs VPU
    shuffle tree), so v10 is tolerance-equal to v4/v9, not bit-equal —
    inside the reference's own fp16 corr regime (<1% mean rel error,
    ref correlation_test.py:245-253; measured maxrel ~2e-3).

    The roll still converts through f32 (Mosaic rejects dynamic rolls on
    16-bit data — direct bf16 roll and an int32-pair bitcast both fail
    to compile); per the phase probes (scripts/dev/corr_variants.py
    probe) load+convert+roll is now the kernel's cost floor.

    Output lanes per pixel are (level*64 + dy*8 + dx) with the dy==7 /
    dx==7 lanes dead (zero): feature dim 9*128 = 1152, mapped onto the
    corr encoder's kernel rows by ``v10_row_map`` (matmul-exact).
    Measured 21.8 -> 14.1 ms/call at E=49152 on TPU v5e.
    """
    f32 = jnp.float32
    i32 = jnp.int32

    @pl.when(pl.program_id(0) >= nlive_ref[0])
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(pl.program_id(0) < nlive_ref[0])
    def _():
        C = g_ref.shape[-1]

        def win8(fmap_ref, x0_ref, y0_ref, ri_ref, e, p):
            w = fmap_ref[0, pl.ds(y0_ref[e, p], D),
                         pl.ds(pl.multiple_of(x0_ref[e, p], 8), DW), :]
            w = pltpu.roll(w.astype(f32), -ri_ref[e, p],
                           axis=1).astype(jnp.bfloat16)
            return w[:, :D, :]

        for e in range(TILE):
            for p in range(P2):
                w1 = win8(fmap1_ref, x0a_ref, y0a_ref, ria_ref, e, p)
                w2 = win8(fmap2_ref, x0b_ref, y0b_ref, rib_ref, e, p)
                W = jnp.concatenate(
                    [w1.reshape(D * D, C), w2.reshape(D * D, C)],
                    axis=0)                           # (128, C) bf16
                g = g_ref[e, p]                       # (C,) bf16
                taps = jax.lax.dot_general(
                    g.reshape(1, C), W, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
                taps_ref[e, p] = taps[0]              # (128,) f32

        taps = taps_ref[...]                  # (TILE, P2, 128) f32
        lane = jax.lax.broadcasted_iota(i32, (TILE, P2, 128), 2)
        dyv = jnp.where(lane < 64, dy2_ref[:, :, 0:1], dy2_ref[:, :, 1:2])
        dxv = jnp.where(lane < 64, dx2_ref[:, :, 0:1], dx2_ref[:, :, 1:2])
        # lanes are (level*64 + dy*8 + dx): the +1-tap operands ride a
        # positive modular lane roll (dy+1 == roll 120, dx+1 == roll 127;
        # static negative shifts are rejected).  Wrap garbage lands only
        # on the dy==7 / dx==7 lanes, masked below.
        ty = (1.0 - dyv) * taps + dyv * pltpu.roll(taps, 120, axis=2)
        tx = (1.0 - dxv) * ty + dxv * pltpu.roll(ty, 127, axis=2)
        alive = ((lane % 8 < D - 1) & ((lane // 8) % 8 < D - 1))
        out_ref[...] = jnp.where(alive, tx, 0.0).astype(out_ref.dtype)


def _kernel_fused_v12(tile_frame_ref, nlive_ref,
                      x0a_ref, y0a_ref, x0b_ref, y0b_ref,
                      meta_ref, g_ref, fmap1_ref, fmap2_ref, out_ref,
                      taps_ref):
    """Fused two-level kernel, v12: no convert, no roll.

    The MXU dot consumes the RAW bf16 16-wide aligned windows (both
    levels stacked into (256, C) per (edge, pixel)), computing taps at
    ALL 16 x positions; the dynamic x-residue selection then folds into
    the batched blend stage as a 10-term select-blend over static lane
    rolls.  Rationale (scripts/dev/corr_variants.py probe at E=49k):
    v10's f32 convert for the dynamic sublane roll was ~6.8 ms of its
    14.1 — v12 trades it for 2x MXU tap work on a nearly idle MXU.
    Measured 14.1 -> 11.7 ms/call at E=49152 on TPU v5e, and maxrel
    ~1e-7 vs v4 on hardware (the bf16 window rows enter the
    f32-accumulating MXU unrounded; only summation order differs).

    Output lanes per pixel: (level*128 + dy*16 + dx'), dy<7 / dx'<7
    live; dead lanes carry GARBAGE (wrap terms) — the only consumer,
    CorrDense's raw path, maps them to a zero kernel row
    (``v12_row_map``), so they never reach the network.  Dead tail
    tiles (past n_live) still write zeros.
    """
    f32 = jnp.float32
    i32 = jnp.int32

    @pl.when(pl.program_id(0) >= nlive_ref[0])
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(pl.program_id(0) < nlive_ref[0])
    def _():
        C = g_ref.shape[-1]
        for e in range(TILE):
            for p in range(P2):
                w1 = fmap1_ref[0, pl.ds(y0a_ref[e, p], D),
                               pl.ds(pl.multiple_of(x0a_ref[e, p], 8),
                                     DW), :]
                w2 = fmap2_ref[0, pl.ds(y0b_ref[e, p], D),
                               pl.ds(pl.multiple_of(x0b_ref[e, p], 8),
                                     DW), :]
                W = jnp.concatenate(
                    [w1.reshape(D * DW, C), w2.reshape(D * DW, C)],
                    axis=0)                            # (256, C) bf16
                g = g_ref[e, p]                        # (C,) bf16
                taps = jax.lax.dot_general(
                    g.reshape(1, C), W, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
                taps_ref[e, p] = taps[0]               # (256,) f32

        T = taps_ref[...]                      # (TILE, P2, 256) f32
        lane = jax.lax.broadcasted_iota(i32, (TILE, P2, 256), 2)
        is1 = lane < 128
        # meta lanes: rra, dxa, dya, rrb, dxb, dyb, 0, 0
        dyv = jnp.where(is1, meta_ref[:, :, 2:3], meta_ref[:, :, 5:6])
        rrv = jnp.where(is1, meta_ref[:, :, 0:1], meta_ref[:, :, 3:4])
        dxv = jnp.where(is1, meta_ref[:, :, 1:2], meta_ref[:, :, 4:5])

        # y bilinear: +1 tap row is +16 lanes (positive modular roll)
        ty = (1.0 - dyv) * T + dyv * pltpu.roll(T, 240, axis=2)
        # x select+blend: out(dx') = (1-dx)*T[rr+dx'] + dx*T[rr+dx'+1],
        # rr in [0, 8] -> 10 select terms over static lane rolls
        out = jnp.zeros_like(ty)
        for s in range(10):
            w_s = (jnp.where(rrv == s, 1.0 - dxv, 0.0)
                   + jnp.where(rrv == s - 1, dxv, 0.0))
            out = out + w_s * pltpu.roll(ty, (256 - s) % 256, axis=2)
        out_ref[...] = out.astype(out_ref.dtype)


def _kernel_fused_v13(tile_frame_ref, nlive_ref,
                      x0a_ref, y0a_ref, x0b_ref, y0b_ref, kkm_ref,
                      meta_ref, g_all_ref, w_enc_ref,
                      fmap1_ref, fmap2_ref, out_ref, taps_ref):
    """v12 + two fusions that erase the corr block's XLA-side HBM
    traffic (VERDICT r4 next#1b):

    - the patch-feature rows gather in-kernel from the WHOLE gmap ring
      buffer held VMEM-resident (constant block, ~8 MB at the bench
      point; per-edge row ids ``kkm`` ride in SMEM) — the XLA path
      materialized g_pre = gmap[kk] as an (E, 9, C) gather,
      ~104 MB written + re-read per update at the retain bucket;
    - the corr encoder's first matmul folds in: the blended v12
      feature block (TILE, P2, 256) contracts with the row-mapped
      corr1 kernel (P2, 256, DIM) as 9 accumulated MXU dots, so the
      kernel emits (TILE, DIM) — the (E, 2304) v12 feature tensor
      (207 MB/update bf16) never exists.  Zero rows of the mapped
      kernel annihilate the v12 dead lanes in-kernel, keeping the
      matmul exact vs CorrDense's raw-v12 path; the f32 blend output
      casts to bf16 before the dot exactly where CorrDense casts.

    out (TILE, DIMo): per-edge corr-encoder pre-bias activations.
    Consumer adds bias + inverse-permutes (models.update.CorrDense
    "enc" form).  Matches /root/reference CUDA corr + net.py:49-51
    corr encoder up to summation order.
    """
    f32 = jnp.float32
    i32 = jnp.int32

    @pl.when(pl.program_id(0) >= nlive_ref[0])
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(pl.program_id(0) < nlive_ref[0])
    def _():
        C = g_all_ref.shape[-1]
        for e in range(TILE):
            for p in range(P2):
                w1 = fmap1_ref[0, pl.ds(y0a_ref[e, p], D),
                               pl.ds(pl.multiple_of(x0a_ref[e, p], 8),
                                     DW), :]
                w2 = fmap2_ref[0, pl.ds(y0b_ref[e, p], D),
                               pl.ds(pl.multiple_of(x0b_ref[e, p], 8),
                                     DW), :]
                W = jnp.concatenate(
                    [w1.reshape(D * DW, C), w2.reshape(D * DW, C)],
                    axis=0)                            # (256, C) bf16
                g = g_all_ref[kkm_ref[e, 0], p]        # (C,) bf16
                taps = jax.lax.dot_general(
                    g.reshape(1, C), W, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
                taps_ref[e, p] = taps[0]               # (256,) f32

        T = taps_ref[...]                      # (TILE, P2, 256) f32
        lane = jax.lax.broadcasted_iota(i32, (TILE, P2, 256), 2)
        is1 = lane < 128
        # meta lanes: rra, dxa, dya, rrb, dxb, dyb, 0, 0
        dyv = jnp.where(is1, meta_ref[:, :, 2:3], meta_ref[:, :, 5:6])
        rrv = jnp.where(is1, meta_ref[:, :, 0:1], meta_ref[:, :, 3:4])
        dxv = jnp.where(is1, meta_ref[:, :, 1:2], meta_ref[:, :, 4:5])

        ty = (1.0 - dyv) * T + dyv * pltpu.roll(T, 240, axis=2)
        out = jnp.zeros_like(ty)
        for s in range(10):
            w_s = (jnp.where(rrv == s, 1.0 - dxv, 0.0)
                   + jnp.where(rrv == s - 1, dxv, 0.0))
            out = out + w_s * pltpu.roll(ty, (256 - s) % 256, axis=2)

        feat = out.astype(w_enc_ref.dtype)     # (TILE, P2, 256)
        acc = jnp.zeros((TILE, out_ref.shape[-1]), f32)
        for p in range(P2):
            acc = acc + jax.lax.dot_general(
                feat[:, p, :], w_enc_ref[p],
                (((1,), (0,)), ((), ())), preferred_element_type=f32)
        out_ref[...] = acc.astype(out_ref.dtype)


RAW_DIM = P2 * (D - 1) * (D - 1)   # per-level feature dim (441)
V10_DIM = P2 * 128                 # v10 feature dim incl. dead lanes
V12_DIM = P2 * 256                 # v12 feature dim incl. dead lanes


def v12_row_map():
    """Like ``v10_row_map`` for the v12 layout: lanes per pixel are
    (level*128 + dy*16 + dx'), dy/dx' in [0, 16)/[0, 16) with only
    dy<7, dx'<7 live; dead lanes (which carry garbage, see
    _kernel_fused_v12) map to the zero row 2*RAW_DIM."""
    import numpy as np
    rows = np.full(V12_DIM, 2 * RAW_DIM, np.int32)
    i = 0
    for py in range(3):
        for px in range(3):
            for level in range(2):
                for dy in range(D):
                    for dx in range(DW):
                        if dy < D - 1 and dx < D - 1:
                            rows[i] = (((dx * (D - 1) + dy) * 3 + py) * 3
                                       + px) * 2 + level
                        i += 1
    return rows


def raw_to_ref_perm():
    """Row permutation mapping the kernel's raw (level, p, dy, dx)
    feature order to the reference's interleaved
    (dx, dy, py, px, level) order: W[raw_to_ref_perm()] applied to the
    corr1 kernel makes a raw-ordered feature vector equivalent to the
    reference-ordered one (matmul row reindexing is exact)."""
    import numpy as np
    ref = np.empty(2 * RAW_DIM, np.int32)
    i = 0
    for level in range(2):
        for py in range(3):
            for px in range(3):
                for dy in range(D - 1):
                    for dx in range(D - 1):
                        ref[i] = (((dx * (D - 1) + dy) * 3 + py) * 3
                                  + px) * 2 + level
                        i += 1
    return ref


def v10_row_map():
    """Row gather map from the v10 kernel's (p, level, dy, dx) feature
    order (dim V10_DIM = 1152, dy/dx in [0, 8) with 7s dead) onto the
    reference's interleaved (dx, dy, py, px, level) corr-encoder rows:
    dead lanes map to index 2*RAW_DIM — callers append a ZERO row to the
    kernel matrix there, so the matmul is exact (dead features are 0
    anyway; the zero row keeps the gather in-bounds)."""
    import numpy as np
    rows = np.full(V10_DIM, 2 * RAW_DIM, np.int32)
    i = 0
    for py in range(3):
        for px in range(3):
            for level in range(2):
                for dy in range(D):
                    for dx in range(D):
                        if dy < D - 1 and dx < D - 1:
                            rows[i] = (((dx * (D - 1) + dy) * 3 + py) * 3
                                       + px) * 2 + level
                        i += 1
    return rows


@partial(jax.jit, static_argnames=("interpret", "version", "raw",
                                   "out_dtype"))
def corr_pallas(g_pre, fmap_padded, coords, tile_frame, n_live=None,
                interpret=False, version=3, raw=False, out_dtype=None):
    """Correlation for jj-grouped edges.

    g_pre       (E, 9, C) patch feature rows (gmap[kidx] flattened)
    fmap_padded (F, Hp, Wp, C) zero-padded feature maps (see pad_fmap)
    coords      (E, 2, 3, 3) float pixel coords (unpadded frame coords)
    tile_frame  (E // TILE,) int32 frame id per tile of TILE edges
    n_live      optional () / (1,) int32 count of live tiles: tiles past
                it skip the tap loop and write zeros (dead rows grouped
                to the tail by corr_grouping_device's valid mask)
    out_dtype   output dtype (default fp32); the engine passes its
                compute dtype so the f32->bf16 cast happens in-kernel
                instead of as a separate relayout copy (the only
                consumer, CorrDense, casts immediately anyway)
    -> (E, 7, 7, 3, 3) ordered [x_off, y_off, py, px] like the
       reference (correlation_kernel.cu:233 permute); with ``raw=True``
       the kernel-native (E, 9, 7, 7) [p, dy, dx] layout is returned
       untransposed (see raw_to_ref_perm).
    """
    E, _, C = g_pre.shape
    F, Hp, Wp, _ = fmap_padded.shape
    assert E % TILE == 0, E
    assert Wp % 8 == 0, Wp
    n_tiles = E // TILE
    if n_live is None:
        n_live = jnp.full((1,), n_tiles, jnp.int32)
    else:
        n_live = jnp.asarray(n_live, jnp.int32).reshape(1)
    out_dtype = out_dtype or jnp.float32

    coords = coords.astype(jnp.float32)
    cx = coords[:, 0].reshape(E, P2)
    cy = coords[:, 1].reshape(E, P2)
    bx_f = jnp.floor(cx)
    by_f = jnp.floor(cy)
    dx = cx - bx_f
    dy = cy - by_f
    # padded-coords window start, clamped into the zero border so that
    # fully out-of-range windows read zeros (see module docstring)
    bx = jnp.clip(bx_f.astype(jnp.int32) + PAD - R, 0, Wp - D)
    by = jnp.clip(by_f.astype(jnp.int32) + PAD - R, 0, Hp - D)
    # 8-aligned load offset + residue (r in [0, 8]; DW=16 covers r+D)
    x0 = jnp.minimum((bx // 8) * 8, Wp - DW)
    ri = (bx - x0).astype(jnp.int32)

    smem = dict(memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, P2), lambda i, tf, nl: (i, 0), **smem),
            pl.BlockSpec((TILE, P2), lambda i, tf, nl: (i, 0), **smem),
            pl.BlockSpec((TILE, P2), lambda i, tf, nl: (i, 0), **smem),
            pl.BlockSpec((TILE, P2), lambda i, tf, nl: (i, 0), **smem),
            pl.BlockSpec((TILE, P2), lambda i, tf, nl: (i, 0), **smem),
            pl.BlockSpec((TILE, P2, C), lambda i, tf, nl: (i, 0, 0)),
            pl.BlockSpec((1, Hp, Wp, C),
                         lambda i, tf, nl: (tf[i], 0, 0, 0)),  # fmap
        ],
        out_specs=pl.BlockSpec((TILE, P2, D - 1, D - 1),
                               lambda i, tf, nl: (i, 0, 0, 0)),
    )

    out = pl.pallas_call(
        _kernel_v3 if version == 3 else _kernel,
        out_shape=jax.ShapeDtypeStruct((E, P2, D - 1, D - 1), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_frame, n_live, x0, by, ri, dx.astype(jnp.float32),
      dy.astype(jnp.float32), g_pre, fmap_padded)

    if raw:
        return out                                    # (E, 9, 7, 7)
    # (E, p, dy, dx) -> (E, x_off, y_off, py, px)
    out = out.reshape(E, 3, 3, D - 1, D - 1)
    return out.transpose(0, 4, 3, 1, 2)


def _window_meta(coords, Hp, Wp):
    """(E, 2, P, P) float coords -> SMEM metadata arrays (x0, by, ri,
    dx, dy), each (E, P2); see corr_pallas for the alignment rules."""
    E = coords.shape[0]
    coords = coords.astype(jnp.float32)
    cx = coords[:, 0].reshape(E, P2)
    cy = coords[:, 1].reshape(E, P2)
    bx_f = jnp.floor(cx)
    by_f = jnp.floor(cy)
    dx = cx - bx_f
    dy = cy - by_f
    bx = jnp.clip(bx_f.astype(jnp.int32) + PAD - R, 0, Wp - D)
    by = jnp.clip(by_f.astype(jnp.int32) + PAD - R, 0, Hp - D)
    x0 = jnp.minimum((bx // 8) * 8, Wp - DW)
    ri = (bx - x0).astype(jnp.int32)
    return x0, by, ri, dx, dy


@partial(jax.jit, static_argnames=("interpret", "out_dtype", "version"))
def corr_pallas_fused(g_pre, fmap1_padded, fmap2_padded, coords,
                      tile_frame, n_live=None, interpret=False,
                      out_dtype=None, version=None):
    # version=5 (single-register taps roll) is bit-identical in
    # interpret mode and ~15% less VPU work on paper, but the dynamic
    # 16-lane roll crashes the Mosaic remote compiler (HTTP 500,
    # tpu_compile_helper exit 1) — kept for when the toolchain accepts
    # it; v4 (window rotate before an 8-wide dot) is the shipped path.
    """Two-level correlation in ONE grid pass (see _kernel_fused).

    coords are level-1 pixel coords; level 2 samples fmap2 at coords/4
    (ref dpvo.py:200-207).  Returns (E, 2, P2, 7, 7) in the raw
    (level, p, dy, dx) order — reshape(E, 882) feeds CorrDense's raw
    path (kernel rows permuted by raw_to_ref_perm, matmul-exact).
    """
    if version is None:
        version = FUSED_VERSION
    if version == 13:
        # v13 is the ENGINE path (corr_pallas_enc: needs the gmap ring
        # + encoder kernel); standalone callers get its v12 core
        # instead of silently falling through to the v4 kernel
        version = 12
    E, _, C = g_pre.shape
    F, Hp1, Wp1, _ = fmap1_padded.shape
    _, Hp2, Wp2, _ = fmap2_padded.shape
    assert E % TILE == 0, E
    n_tiles = E // TILE
    if n_live is None:
        n_live = jnp.full((1,), n_tiles, jnp.int32)
    else:
        n_live = jnp.asarray(n_live, jnp.int32).reshape(1)
    out_dtype = out_dtype or jnp.float32

    x0a, bya, ria, dxa, dya = _window_meta(coords, Hp1, Wp1)
    x0b, byb, rib, dxb, dyb = _window_meta(coords / 4.0, Hp2, Wp2)

    smem = dict(memory_space=pltpu.SMEM)
    sspec = pl.BlockSpec((TILE, P2), lambda i, tf, nl: (i, 0), **smem)

    if version == 12:
        meta = jnp.stack(
            [ria.astype(jnp.float32), dxa.astype(jnp.float32),
             dya.astype(jnp.float32), rib.astype(jnp.float32),
             dxb.astype(jnp.float32), dyb.astype(jnp.float32),
             jnp.zeros_like(dxa, jnp.float32),
             jnp.zeros_like(dxa, jnp.float32)], axis=-1)   # (E, P2, 8)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[sspec] * 4 + [
                pl.BlockSpec((TILE, P2, 8), lambda i, tf, nl: (i, 0, 0)),
                pl.BlockSpec((TILE, P2, C), lambda i, tf, nl: (i, 0, 0)),
                pl.BlockSpec((1, Hp1, Wp1, C),
                             lambda i, tf, nl: (tf[i], 0, 0, 0)),
                pl.BlockSpec((1, Hp2, Wp2, C),
                             lambda i, tf, nl: (tf[i], 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((TILE, P2, 256),
                                   lambda i, tf, nl: (i, 0, 0)),
            scratch_shapes=[pltpu.VMEM((TILE, P2, 256), jnp.float32)],
        )
        return pl.pallas_call(
            _kernel_fused_v12,
            out_shape=jax.ShapeDtypeStruct((E, P2, 256), out_dtype),
            grid_spec=grid_spec,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(tile_frame, n_live, x0a, bya, x0b, byb, meta,
          g_pre, fmap1_padded, fmap2_padded)

    if version == 10:
        # MXU channel-dot kernel; output is the v10 feature layout
        # (E, P2, 128) with lanes (level*64 + dy*8 + dx) — see
        # v10_row_map for the corr-encoder row mapping.
        dx2 = jnp.stack([dxa, dxb], axis=-1).astype(jnp.float32)
        dy2 = jnp.stack([dya, dyb], axis=-1).astype(jnp.float32)
        vspec2 = pl.BlockSpec((TILE, P2, 2), lambda i, tf, nl: (i, 0, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[sspec] * 6 + [vspec2] * 2 + [
                pl.BlockSpec((TILE, P2, C), lambda i, tf, nl: (i, 0, 0)),
                pl.BlockSpec((1, Hp1, Wp1, C),
                             lambda i, tf, nl: (tf[i], 0, 0, 0)),
                pl.BlockSpec((1, Hp2, Wp2, C),
                             lambda i, tf, nl: (tf[i], 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((TILE, P2, 128),
                                   lambda i, tf, nl: (i, 0, 0)),
            scratch_shapes=[pltpu.VMEM((TILE, P2, 128), jnp.float32)],
        )
        return pl.pallas_call(
            _kernel_fused_v10,
            out_shape=jax.ShapeDtypeStruct((E, P2, 128), out_dtype),
            grid_spec=grid_spec,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(tile_frame, n_live, x0a, bya, ria, x0b, byb, rib,
          dx2, dy2, g_pre, fmap1_padded, fmap2_padded)

    if version == 9:
        # dx/dy ride as (E, 2, P2) VMEM blocks for the batched blends;
        # only the load metadata (x0/y0/ri) stays scalar in SMEM.
        dx2 = jnp.stack([dxa, dxb], axis=1).astype(jnp.float32)
        dy2 = jnp.stack([dya, dyb], axis=1).astype(jnp.float32)
        dx2 = dx2[:, :, :, None, None]               # (E, 2, P2, 1, 1)
        dy2 = dy2[:, :, :, None, None]
        vspec = pl.BlockSpec((TILE, 2, P2, 1, 1),
                             lambda i, tf, nl: (i, 0, 0, 0, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[sspec] * 6 + [vspec] * 2 + [
                pl.BlockSpec((TILE, P2, C), lambda i, tf, nl: (i, 0, 0)),
                pl.BlockSpec((1, Hp1, Wp1, C),
                             lambda i, tf, nl: (tf[i], 0, 0, 0)),
                pl.BlockSpec((1, Hp2, Wp2, C),
                             lambda i, tf, nl: (tf[i], 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((TILE, 2, P2, D - 1, D - 1),
                                   lambda i, tf, nl: (i, 0, 0, 0, 0)),
            scratch_shapes=[pltpu.VMEM((TILE, 2, P2, D, D),
                                       jnp.float32)],
        )
        # the (1, 1)-trailing dx/dy blocks tile-pad to (8, 128) each —
        # ~4.7 MB of double-buffered VMEM on top of the fmap blocks,
        # which busts the 16 MB scoped-vmem default at full-frame fmaps.
        # v5e has 128 MB of VMEM; raise the scoped limit for this call.
        return pl.pallas_call(
            _kernel_fused_v9,
            out_shape=jax.ShapeDtypeStruct((E, 2, P2, D - 1, D - 1),
                                           out_dtype),
            grid_spec=grid_spec,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(tile_frame, n_live, x0a, bya, ria, x0b, byb, rib,
          dx2, dy2, g_pre, fmap1_padded, fmap2_padded)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[sspec] * 10 + [
            pl.BlockSpec((TILE, P2, C), lambda i, tf, nl: (i, 0, 0)),
            pl.BlockSpec((1, Hp1, Wp1, C),
                         lambda i, tf, nl: (tf[i], 0, 0, 0)),
            pl.BlockSpec((1, Hp2, Wp2, C),
                         lambda i, tf, nl: (tf[i], 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, 2, P2, D - 1, D - 1),
                               lambda i, tf, nl: (i, 0, 0, 0, 0)),
    )

    return pl.pallas_call(
        _kernel_fused_v5 if version == 5 else _kernel_fused,
        out_shape=jax.ShapeDtypeStruct((E, 2, P2, D - 1, D - 1),
                                       out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_frame, n_live, x0a, bya, ria,
      dxa.astype(jnp.float32), dya.astype(jnp.float32),
      x0b, byb, rib, dxb.astype(jnp.float32), dyb.astype(jnp.float32),
      g_pre, fmap1_padded, fmap2_padded)


def map_enc_kernel(kernel):
    """Row-map the checkpoint-shaped corr1 kernel (2*RAW_DIM, DIMo)
    onto the v13 in-kernel layout (P2, 256, DIMo): dead v12 lanes map
    to an appended zero row (annihilating the kernel's wrap garbage),
    live lanes to their reference row (matmul-exact reindexing)."""
    kz = jnp.concatenate(
        [kernel, jnp.zeros((1, kernel.shape[1]), kernel.dtype)])
    return kz[jnp.asarray(v12_row_map())].reshape(
        P2, 256, kernel.shape[1])


@partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def corr_pallas_enc(g_all, kk_rows, w_enc, fmap1_padded, fmap2_padded,
                    coords, tile_frame, n_live=None, interpret=False,
                    out_dtype=None):
    """Fused two-level correlation + corr-encoder first matmul (v13).

    g_all       (K, P2, C) the WHOLE gmap ring (bf16) — VMEM-resident
                constant block; no per-edge gather materializes in HBM
    kk_rows     (E,) int32 row ids into g_all per (sorted) edge
    w_enc       (P2, 256, DIMo) row-mapped corr1 kernel
                (see map_enc_kernel), compute dtype
    coords      (E, 2, 3, 3) level-1 pixel coords
    -> (E, DIMo) pre-bias corr-encoder activations in out_dtype.
    Consumer adds bias + inverse-permutes (CorrDense "enc" form).
    """
    E = coords.shape[0]
    K, _, C = g_all.shape
    F, Hp1, Wp1, _ = fmap1_padded.shape
    _, Hp2, Wp2, _ = fmap2_padded.shape
    assert E % TILE == 0, E
    DIMo = w_enc.shape[-1]
    n_tiles = E // TILE
    if n_live is None:
        n_live = jnp.full((1,), n_tiles, jnp.int32)
    else:
        n_live = jnp.asarray(n_live, jnp.int32).reshape(1)
    out_dtype = out_dtype or jnp.float32

    x0a, bya, ria, dxa, dya = _window_meta(coords, Hp1, Wp1)
    x0b, byb, rib, dxb, dyb = _window_meta(coords / 4.0, Hp2, Wp2)
    meta = jnp.stack(
        [ria.astype(jnp.float32), dxa.astype(jnp.float32),
         dya.astype(jnp.float32), rib.astype(jnp.float32),
         dxb.astype(jnp.float32), dyb.astype(jnp.float32),
         jnp.zeros_like(dxa, jnp.float32),
         jnp.zeros_like(dxa, jnp.float32)], axis=-1)       # (E, P2, 8)
    kk2 = jnp.asarray(kk_rows, jnp.int32).reshape(E, 1)

    smem = dict(memory_space=pltpu.SMEM)
    sspec = pl.BlockSpec((TILE, P2), lambda i, tf, nl: (i, 0), **smem)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[sspec] * 4 + [
            pl.BlockSpec((TILE, 1), lambda i, tf, nl: (i, 0), **smem),
            pl.BlockSpec((TILE, P2, 8), lambda i, tf, nl: (i, 0, 0)),
            pl.BlockSpec((K, P2, C), lambda i, tf, nl: (0, 0, 0)),
            pl.BlockSpec((P2, 256, DIMo), lambda i, tf, nl: (0, 0, 0)),
            pl.BlockSpec((1, Hp1, Wp1, C),
                         lambda i, tf, nl: (tf[i], 0, 0, 0)),
            pl.BlockSpec((1, Hp2, Wp2, C),
                         lambda i, tf, nl: (tf[i], 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, DIMo), lambda i, tf, nl: (i, 0)),
        scratch_shapes=[pltpu.VMEM((TILE, P2, 256), jnp.float32)],
    )
    return pl.pallas_call(
        _kernel_fused_v13,
        out_shape=jax.ShapeDtypeStruct((E, DIMo), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tile_frame, n_live, x0a, bya, x0b, byb, kk2, meta,
      g_all, w_enc, fmap1_padded, fmap2_padded)


def corr_grouping_device(jj, mem, valid=None):
    """Device twin of the engine's host ``_corr_grouping_np``: sort edges
    by fmap ring slot and pad each slot's group to TILE multiples so the
    kernel sees frame-pure tiles.

    jj (E,) int32 raw target-frame ids (rows past the live count may be
    stale — their output rows are never read, they only must not break
    frame purity, which sorting by slot guarantees).
    valid (E,) optional bool: invalid rows sort into a dedicated DEAD
    group at the tail so the kernel can skip their tiles entirely
    (n_live below); without it every row lands in a live group and
    n_live covers the whole grid.
    Returns (perm (Es,), inv (E,), tile_frame (Es//TILE,), n_live) int32
    with Es = E + (mem+1)*TILE, semantically equivalent to the host
    version: perm[t*TILE:(t+1)*TILE] all target ring slot tile_frame[t],
    and inv[e] gives edge e's row in the permuted table.
    """
    E = jj.shape[0]
    G = mem + 1                                       # + dead group
    Es = E + G * TILE
    idx = jnp.arange(E, dtype=jnp.int32)
    slots = (jj % mem).astype(jnp.int32)
    if valid is not None:
        slots = jnp.where(valid, slots, mem)
    order = jnp.argsort(slots, stable=True).astype(jnp.int32)
    ss = slots[order]

    counts = jax.ops.segment_sum(jnp.ones((E,), jnp.int32), slots,
                                 num_segments=G)
    padded = ((counts + TILE - 1) // TILE) * TILE
    cum_pad = jnp.cumsum(padded)                      # inclusive (G,)
    offs = cum_pad - padded                           # exclusive
    cum_cnt = jnp.cumsum(counts)
    starts = cum_cnt - counts                         # unpadded starts

    # dest position of each sorted row: group offset + rank in group
    rank = idx - starts[ss]
    dest = offs[ss] + rank                            # (E,)

    # per-group anchor row (first sorted row; empty groups borrow a real
    # row, keeping their — never-read — tiles frame-pure)
    first_idx = jnp.clip(starts, 0, E - 1)
    anchor = order[first_idx]                         # (G,)
    aslot = jnp.minimum(ss[first_idx], mem - 1)       # dead group -> mem-1

    # defaults for pad rows / tail tiles, then scatter the real rows
    d_idx = jnp.arange(Es, dtype=jnp.int32)
    g_of = jnp.clip(jnp.searchsorted(cum_pad, d_idx, side="right"),
                    0, G - 1)
    perm = anchor[g_of].at[dest].set(order)
    inv = jnp.zeros((E,), jnp.int32).at[order].set(dest)
    t_idx = jnp.arange(Es // TILE, dtype=jnp.int32) * TILE
    g_of_t = jnp.clip(jnp.searchsorted(cum_pad, t_idx, side="right"),
                      0, G - 1)
    tile_frame = aslot[g_of_t]
    # tiles holding live rows: all live groups' padded extents
    n_live = (cum_pad[mem - 1] // TILE).astype(jnp.int32)
    return perm, inv, tile_frame, n_live


def corr_grouped(gmap, fmap_padded, coords, kidx, tile_frame,
                 n_live=None, interpret=False, version=3):
    """Convenience wrapper: gathers gmap rows then runs the kernel.

    gmap (K, 3, 3, C); fmap_padded (F, Hp, Wp, C);
    coords (E, 2, 3, 3); kidx (E,); tile_frame (E//TILE,).
    """
    E = coords.shape[0]
    C = gmap.shape[-1]
    g_pre = gmap[kidx].reshape(E, P2, C)
    return corr_pallas(g_pre, fmap_padded, coords, tile_frame,
                       n_live=n_live, interpret=interpret,
                       version=version)
