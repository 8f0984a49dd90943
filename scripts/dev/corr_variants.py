"""Corr kernel variant lab (round 3 retain-regime push).

The fused two-level kernel (corr_pallas.corr_pallas_fused, v4) is
VPU-issue-bound: per (edge, pixel, level) it spends ~96 vector ops of
which only ~8 are the useful multiplies — the rest are the f32 convert
of the 16-wide window (16), the dynamic sublane roll (16), and the
cross-lane channel reduction (~56).  Variants here attack the
convert/roll share; the lane reduction is structural for a
channels-on-lanes layout (any VPU formulation pays it).

Run on TPU:      python scripts/dev/corr_variants.py [E]
Check on CPU:    JAX_PLATFORMS=cpu python scripts/dev/corr_variants.py check
"""
import sys
from functools import partial

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts/dev")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dpvo_tpu.ops import corr_pallas as cp

D, DW, P2, TILE = cp.D, cp.DW, cp.P2, cp.TILE


def _blend(taps, dyv, dxv, rows, cols, rr=None):
    """(8, 8|16) taps -> (7, 7): y bilinear + x select/blend matrix."""
    ty = (1 - dyv) * taps[:-1, :] + dyv * taps[1:, :]
    if rr is None:
        bx = (jnp.where(rows == cols, 1.0 - dxv, 0.0)
              + jnp.where(rows == cols + 1, dxv, 0.0))
    else:
        bx = (jnp.where(rows == cols + rr, 1.0 - dxv, 0.0)
              + jnp.where(rows == cols + rr + 1, dxv, 0.0))
    return jnp.sum(ty[:, :, None] * bx[None, :, :], axis=1)


def _mk_fused(body16):
    """Wrap a per-(e,p)-body into the fused two-level kernel shape."""

    def kernel(tile_frame_ref, nlive_ref,
               x0a_ref, y0a_ref, ria_ref, dxa_ref, dya_ref,
               x0b_ref, y0b_ref, rib_ref, dxb_ref, dyb_ref,
               g_ref, fmap1_ref, fmap2_ref, out_ref):
        @pl.when(pl.program_id(0) >= nlive_ref[0])
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        @pl.when(pl.program_id(0) < nlive_ref[0])
        def _():
            rows8 = jax.lax.broadcasted_iota(jnp.int32, (D, D - 1), 0)
            cols8 = jax.lax.broadcasted_iota(jnp.int32, (D, D - 1), 1)
            rows16 = jax.lax.broadcasted_iota(jnp.int32, (DW, D - 1), 0)
            cols16 = jax.lax.broadcasted_iota(jnp.int32, (DW, D - 1), 1)
            for e in range(TILE):
                for p in range(P2):
                    g = g_ref[e, p].astype(jnp.float32)
                    out_ref[e, 0, p] = body16(
                        fmap1_ref, x0a_ref, y0a_ref, ria_ref, dxa_ref,
                        dya_ref, e, p, g, rows8, cols8, rows16,
                        cols16).astype(out_ref.dtype)
                    out_ref[e, 1, p] = body16(
                        fmap2_ref, x0b_ref, y0b_ref, rib_ref, dxb_ref,
                        dyb_ref, e, p, g, rows8, cols8, rows16,
                        cols16).astype(out_ref.dtype)
    return kernel


def _body_v4(fmap_ref, x0_ref, y0_ref, ri_ref, dx_ref, dy_ref, e, p, g,
             rows8, cols8, rows16, cols16):
    """Shipped v4: f32 convert (16-wide), dynamic sublane roll, 8-wide
    dot."""
    y0 = y0_ref[e, p]
    x0 = pl.multiple_of(x0_ref[e, p], 8)
    win = fmap_ref[0, pl.ds(y0, D), pl.ds(x0, DW), :]
    win8 = pltpu.roll(win.astype(jnp.float32), -ri_ref[e, p],
                      axis=1)[:, :D, :]
    taps = jnp.sum(win8 * g[None, None, :], axis=2)
    return _blend(taps, dy_ref[e, p], dx_ref[e, p], rows8, cols8)


def _body_v6a(fmap_ref, x0_ref, y0_ref, ri_ref, dx_ref, dy_ref, e, p, g,
              rows8, cols8, rows16, cols16):
    """v6a: roll the RAW bf16 window (half the data), slice to 8, then
    convert only the kept half."""
    y0 = y0_ref[e, p]
    x0 = pl.multiple_of(x0_ref[e, p], 8)
    win = fmap_ref[0, pl.ds(y0, D), pl.ds(x0, DW), :]
    win8 = pltpu.roll(win, -ri_ref[e, p], axis=1)[:, :D, :]
    taps = jnp.sum(win8.astype(jnp.float32) * g[None, None, :], axis=2)
    return _blend(taps, dy_ref[e, p], dx_ref[e, p], rows8, cols8)


def _body_v6b(fmap_ref, x0_ref, y0_ref, ri_ref, dx_ref, dy_ref, e, p, g,
              rows8, cols8, rows16, cols16):
    """v6b: NO roll — 16-wide dot, residue folded into the (16, 7)
    select/blend matrix (the v1 ordering, in the fused kernel)."""
    y0 = y0_ref[e, p]
    x0 = pl.multiple_of(x0_ref[e, p], 8)
    win = fmap_ref[0, pl.ds(y0, D), pl.ds(x0, DW), :]
    taps = jnp.sum(win.astype(jnp.float32) * g[None, None, :], axis=2)
    return _blend(taps, dy_ref[e, p], dx_ref[e, p], rows16, cols16,
                  rr=ri_ref[e, p])


def _body_v6c(fmap_ref, x0_ref, y0_ref, ri_ref, dx_ref, dy_ref, e, p, g,
              rows8, cols8, rows16, cols16):
    """v6c: bf16 multiply, f32 accumulation via dtype-carrying sum —
    no pre-converted f32 window materialization at all."""
    y0 = y0_ref[e, p]
    x0 = pl.multiple_of(x0_ref[e, p], 8)
    win = fmap_ref[0, pl.ds(y0, D), pl.ds(x0, DW), :]
    win8 = pltpu.roll(win, -ri_ref[e, p], axis=1)[:, :D, :]
    taps = jnp.sum(win8 * g.astype(win8.dtype)[None, None, :], axis=2,
                   dtype=jnp.float32)
    return _blend(taps, dy_ref[e, p], dx_ref[e, p], rows8, cols8)


def _body_v7(fmap_ref, x0_ref, y0_ref, ri_ref, dx_ref, dy_ref, e, p, g,
             rows8, cols8, rows16, cols16):
    """v7: per-(e,p) channel dot as an MXU matmul on the (128, C)
    reshaped window (8y*16x rows), then the v6b-style blend.  Probes
    whether Mosaic pipelines 288 small matmuls better than the VPU
    lane reductions."""
    y0 = y0_ref[e, p]
    x0 = pl.multiple_of(x0_ref[e, p], 8)
    win = fmap_ref[0, pl.ds(y0, D), pl.ds(x0, DW), :]
    rows = win.astype(jnp.float32).reshape(D * DW, -1)   # (128, C)
    taps = jax.lax.dot_general(
        rows, g.reshape(-1, 1),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(D, DW)
    return _blend(taps, dy_ref[e, p], dx_ref[e, p], rows16, cols16,
                  rr=ri_ref[e, p])


def _kernel_v8(tile_frame_ref, nlive_ref,
               x0a_ref, y0a_ref, ria_ref, dxa_ref, dya_ref,
               x0b_ref, y0b_ref, rib_ref, dxb_ref, dyb_ref,
               g_ref, fmap1_ref, fmap2_ref, out_ref):
    """v8: both levels' windows concatenated into one (16, 16, C) block
    per (e, p) — one roll/convert/mult/reduce chain of double width
    instead of two, halving per-iteration dispatch overhead.  Rolls are
    per-level (residues differ) but the dot+reduce is one op."""
    f32 = jnp.float32

    @pl.when(pl.program_id(0) >= nlive_ref[0])
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(pl.program_id(0) < nlive_ref[0])
    def _():
        rows = jax.lax.broadcasted_iota(jnp.int32, (D, D - 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (D, D - 1), 1)
        for e in range(TILE):
            for p in range(P2):
                g = g_ref[e, p].astype(f32)
                w1 = fmap1_ref[0, pl.ds(y0a_ref[e, p], D),
                               pl.ds(pl.multiple_of(x0a_ref[e, p], 8),
                                     DW), :]
                w2 = fmap2_ref[0, pl.ds(y0b_ref[e, p], D),
                               pl.ds(pl.multiple_of(x0b_ref[e, p], 8),
                                     DW), :]
                w1 = pltpu.roll(w1.astype(f32), -ria_ref[e, p],
                                axis=1)[:, :D, :]
                w2 = pltpu.roll(w2.astype(f32), -rib_ref[e, p],
                                axis=1)[:, :D, :]
                wc = jnp.concatenate([w1, w2], axis=0)      # (16, 8, C)
                taps = jnp.sum(wc * g[None, None, :], axis=2)
                out_ref[e, 0, p] = _blend(
                    taps[:D], dya_ref[e, p], dxa_ref[e, p], rows,
                    cols).astype(out_ref.dtype)
                out_ref[e, 1, p] = _blend(
                    taps[D:], dyb_ref[e, p], dxb_ref[e, p], rows,
                    cols).astype(out_ref.dtype)


KERNELS = {
    "v4": _mk_fused(_body_v4),
    "v6a": _mk_fused(_body_v6a),
    "v6b": _mk_fused(_body_v6b),
    "v6c": _mk_fused(_body_v6c),
    "v7": _mk_fused(_body_v7),
    "v8": _kernel_v8,
}


# ------------------------------------------------------------------ v10
# MXU channel dot: per (e, p) both levels' rolled bf16 windows stack
# into one (128 taps, C) matrix and ONE dot_general against the g row
# computes all 128 taps — the VPU stops doing the 56-op lane reduction
# entirely (it was ~60% of v9's issue count) and only handles loads,
# rolls and the batched blends.  bf16 x bf16 -> f32 products are exact
# (same as v4's f32 multiply); only the f32 ACCUMULATION ORDER differs
# (MXU systolic chain vs VPU shuffle tree), so v10 is tolerance-equal
# to v4, not bit-equal.  Output lanes are (level*64 + dy*8 + dx) per
# pixel with dy=7 / dx=7 lanes zeroed (dead): feature dim 9*128=1152.

def _roll_x_bf16(win, rr):
    """Dynamic roll along axis 1 of a bf16 (8, 16, C) window.

    bf16 arrays pack two values per 32-bit lane-row; Mosaic's dynamic
    roll needs 32-bit elements, so pair ADJACENT CHANNELS into int32
    (the roll axis is x — channel pairing is unaffected), roll, and
    bitcast back."""
    w32 = win.reshape(D, DW, -1, 2)
    w32 = jax.lax.bitcast_convert_type(w32, jnp.int32)  # (8, 16, C//2)
    w32 = pltpu.roll(w32, -rr, axis=1)
    out = jax.lax.bitcast_convert_type(w32, jnp.bfloat16)
    return out.reshape(D, DW, -1)


def _mk_v10(roll_fn, row_dot):
    def kernel(tile_frame_ref, nlive_ref,
               x0a_ref, y0a_ref, ria_ref,
               x0b_ref, y0b_ref, rib_ref,
               dx2_ref, dy2_ref,
               g_ref, fmap1_ref, fmap2_ref, out_ref, taps_ref):
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
                    w1 = roll_fn(w1, ria_ref[e, p])[:, :D, :]
                    w2 = roll_fn(w2, rib_ref[e, p])[:, :D, :]
                    W = jnp.concatenate(
                        [w1.reshape(D * D, C), w2.reshape(D * D, C)],
                        axis=0)                          # (128, C) bf16
                    g = g_ref[e, p]                      # (C,) bf16
                    if row_dot:
                        taps = jax.lax.dot_general(
                            g.reshape(1, C), W, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        taps_ref[e, p] = taps[0]         # (128,) f32
                    else:
                        taps = jax.lax.dot_general(
                            W, g.reshape(C, 1), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        taps_ref[e, p] = taps[:, 0]

            taps = taps_ref[...]                 # (TILE, P2, 128) f32
            lane = jax.lax.broadcasted_iota(i32, (TILE, P2, 128), 2)
            dyv = jnp.where(lane < 64, dy2_ref[:, :, 0:1],
                            dy2_ref[:, :, 1:2])
            dxv = jnp.where(lane < 64, dx2_ref[:, :, 0:1],
                            dx2_ref[:, :, 1:2])
            # lanes are (level*64 + y*8 + x): y+1 == lane+8, x+1 == lane+1
            # (rolls use the positive modular shift — static negatives
            # are rejected).  Wrap garbage lands only on y==7 / x==7
            # lanes, masked below.
            ty = (1.0 - dyv) * taps + dyv * pltpu.roll(taps, 120, axis=2)
            tx = (1.0 - dxv) * ty + dxv * pltpu.roll(ty, 127, axis=2)
            alive = ((lane % 8 < D - 1)
                     & ((lane // 8) % 8 < D - 1))
            out_ref[...] = jnp.where(alive, tx, 0.0).astype(out_ref.dtype)
    return kernel


V10_KERNELS = {
    "v10": _mk_v10(_roll_x_bf16, True),          # bf16 roll, row dot
    "v10c": _mk_v10(_roll_x_bf16, False),        # bf16 roll, column dot
    "v10f": _mk_v10(
        lambda w, rr: pltpu.roll(w.astype(jnp.float32), -rr,
                                 axis=1).astype(jnp.bfloat16), True),
    # plain dynamic roll on bf16 data (no convert round-trip): the v10
    # docstring's "needs 32-bit" claim re-tested on the current Mosaic
    "v10b": _mk_v10(lambda w, rr: pltpu.roll(w, -rr, axis=1), True),
}


@partial(jax.jit, static_argnames=("variant", "interpret", "out_dtype"))
def v10_variant(g_pre, fmap1_padded, fmap2_padded, coords, tile_frame,
                n_live=None, variant="v10", interpret=False,
                out_dtype=None):
    """v10 family: returns (E, P2, 128) features, lanes (level, dy, dx)
    with dy==7 / dx==7 lanes zero."""
    E, _, C = g_pre.shape
    F, Hp1, Wp1, _ = fmap1_padded.shape
    _, Hp2, Wp2, _ = fmap2_padded.shape
    n_tiles = E // TILE
    if n_live is None:
        n_live = jnp.full((1,), n_tiles, jnp.int32)
    else:
        n_live = jnp.asarray(n_live, jnp.int32).reshape(1)
    out_dtype = out_dtype or jnp.float32

    x0a, bya, ria, dxa, dya = cp._window_meta(coords, Hp1, Wp1)
    x0b, byb, rib, dxb, dyb = cp._window_meta(coords / 4.0, Hp2, Wp2)
    dx2 = jnp.stack([dxa, dxb], axis=-1).astype(jnp.float32)  # (E, P2, 2)
    dy2 = jnp.stack([dya, dyb], axis=-1).astype(jnp.float32)

    smem = dict(memory_space=pltpu.SMEM)
    sspec = pl.BlockSpec((TILE, P2), lambda i, tf, nl: (i, 0), **smem)
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
        V10_KERNELS[variant],
        out_shape=jax.ShapeDtypeStruct((E, P2, 128), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(tile_frame, n_live, x0a, bya, ria, x0b, byb, rib,
      dx2, dy2, g_pre, fmap1_padded, fmap2_padded)


def v10_to_ref(out10):
    """(E, P2, 128) v10 features -> (E, 2, P2, 7, 7) fused layout."""
    E = out10.shape[0]
    t = np.asarray(out10, np.float32).reshape(E, P2, 2, 8, 8)
    return t[:, :, :, :7, :7].transpose(0, 2, 1, 3, 4)


# ------------------------------------------------------------------ v12
# No convert, no roll: the MXU dot consumes the RAW bf16 16-wide aligned
# window (both levels stacked: (256, C) per (edge, pixel)), computing
# taps at ALL 16 x positions; the dynamic x-residue selection folds into
# the batched blend stage as a 10-term select-blend over static lane
# rolls.  Per the probes the f32 convert was ~6.8 ms of v10's 14.1 at
# E=49k — v12 trades it for 2x MXU tap work (the MXU is nearly idle).
# Output lanes per pixel: (level*128 + dy*16 + dx'), dy<7 / dx'<7 live.

def _kernel_v12(tile_frame_ref, nlive_ref,
                x0a_ref, y0a_ref, x0b_ref, y0b_ref,
                meta_ref, g_ref, fmap1_ref, fmap2_ref, out_ref,
                taps_ref):
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


@partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def v12_variant(g_pre, fmap1_padded, fmap2_padded, coords, tile_frame,
                n_live=None, interpret=False, out_dtype=None):
    """v12: returns (E, P2, 256) features, lanes (level*128 + dy*16+dx')
    with dy>=7 / dx'>=7 lanes dead (garbage — consumers must zero-map
    them, see corr_pallas.v10_row_map for the mechanism)."""
    E, _, C = g_pre.shape
    F, Hp1, Wp1, _ = fmap1_padded.shape
    _, Hp2, Wp2, _ = fmap2_padded.shape
    n_tiles = E // TILE
    if n_live is None:
        n_live = jnp.full((1,), n_tiles, jnp.int32)
    else:
        n_live = jnp.asarray(n_live, jnp.int32).reshape(1)
    out_dtype = out_dtype or jnp.float32

    x0a, bya, ria, dxa, dya = cp._window_meta(coords, Hp1, Wp1)
    x0b, byb, rib, dxb, dyb = cp._window_meta(coords / 4.0, Hp2, Wp2)
    meta = jnp.stack(
        [ria.astype(jnp.float32), dxa.astype(jnp.float32),
         dya.astype(jnp.float32), rib.astype(jnp.float32),
         dxb.astype(jnp.float32), dyb.astype(jnp.float32),
         jnp.zeros_like(dxa, jnp.float32),
         jnp.zeros_like(dxa, jnp.float32)], axis=-1)   # (E, P2, 8)

    smem = dict(memory_space=pltpu.SMEM)
    sspec = pl.BlockSpec((TILE, P2), lambda i, tf, nl: (i, 0), **smem)
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
        _kernel_v12,
        out_shape=jax.ShapeDtypeStruct((E, P2, 256), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(tile_frame, n_live, x0a, bya, x0b, byb, meta,
      g_pre, fmap1_padded, fmap2_padded)


def v12_to_ref(out12):
    """(E, P2, 256) v12 features -> (E, 2, P2, 7, 7) fused layout."""
    E = out12.shape[0]
    t = np.asarray(out12, np.float32).reshape(E, P2, 2, 8, 16)
    return t[:, :, :, :7, :7].transpose(0, 2, 1, 3, 4)


# ---------------------------------------------------------------- probes
# Phase-attribution kernels: same tile/loop structure and loads as the
# real kernel, each keeping a prefix of the per-(e, p) pipeline.  The
# measured deltas attribute the per-(edge, pixel) time to load/convert/
# roll/mult/lane-reduce/blends — the data that decides which variant is
# worth shipping.

def _mk_probe(body, out_block):
    def kernel(tile_frame_ref, nlive_ref,
               x0a_ref, y0a_ref, ria_ref, dxa_ref, dya_ref,
               x0b_ref, y0b_ref, rib_ref, dxb_ref, dyb_ref,
               g_ref, fmap1_ref, fmap2_ref, out_ref):
        @pl.when(pl.program_id(0) >= nlive_ref[0])
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        @pl.when(pl.program_id(0) < nlive_ref[0])
        def _():
            for e in range(TILE):
                for p in range(P2):
                    g = g_ref[e, p].astype(jnp.float32)
                    out_ref[e, 0, p] = body(
                        fmap1_ref, x0a_ref, y0a_ref, ria_ref, e, p,
                        g).astype(out_ref.dtype)
                    out_ref[e, 1, p] = body(
                        fmap2_ref, x0b_ref, y0b_ref, rib_ref, e, p,
                        g).astype(out_ref.dtype)
    return kernel, out_block


def _probe_load(fmap_ref, x0_ref, y0_ref, ri_ref, e, p, g):
    """Load + one cheap row convert (keeps the DMA alive)."""
    win = fmap_ref[0, pl.ds(y0_ref[e, p], D),
                   pl.ds(pl.multiple_of(x0_ref[e, p], 8), DW), :]
    return win[:, 0, :].astype(jnp.float32)                 # (8, C)


def _probe_convert(fmap_ref, x0_ref, y0_ref, ri_ref, e, p, g):
    """Load + full f32 convert (sum over x keeps all columns alive
    with a cheap 16-sublane reduce)."""
    win = fmap_ref[0, pl.ds(y0_ref[e, p], D),
                   pl.ds(pl.multiple_of(x0_ref[e, p], 8), DW), :]
    return jnp.sum(win.astype(jnp.float32), axis=1)         # (8, C)


def _probe_roll(fmap_ref, x0_ref, y0_ref, ri_ref, e, p, g):
    """Load + convert + dynamic roll (no dot)."""
    win = fmap_ref[0, pl.ds(y0_ref[e, p], D),
                   pl.ds(pl.multiple_of(x0_ref[e, p], 8), DW), :]
    w = pltpu.roll(win.astype(jnp.float32), -ri_ref[e, p], axis=1)
    return w[:, 0, :]                                       # (8, C)


def _probe_mult_subl(fmap_ref, x0_ref, y0_ref, ri_ref, e, p, g):
    """Load + convert + roll + mult, reduce over the X SUBLANE axis
    (wrong math, same mult count): isolates lane-reduce vs
    sublane-reduce cost."""
    win = fmap_ref[0, pl.ds(y0_ref[e, p], D),
                   pl.ds(pl.multiple_of(x0_ref[e, p], 8), DW), :]
    w = pltpu.roll(win.astype(jnp.float32), -ri_ref[e, p],
                   axis=1)[:, :D, :]
    return jnp.sum(w * g[None, None, :], axis=1)            # (8, C)


def _probe_full_dot(fmap_ref, x0_ref, y0_ref, ri_ref, e, p, g):
    """Load + convert + roll + mult + LANE reduce (= v4 minus blends),
    broadcast back to (8, C) so the out block matches."""
    win = fmap_ref[0, pl.ds(y0_ref[e, p], D),
                   pl.ds(pl.multiple_of(x0_ref[e, p], 8), DW), :]
    w = pltpu.roll(win.astype(jnp.float32), -ri_ref[e, p],
                   axis=1)[:, :D, :]
    taps = jnp.sum(w * g[None, None, :], axis=2)            # (8, 8)
    return jnp.pad(taps, ((0, 0), (0, g.shape[0] - D)))     # (8, C)


PROBES = {
    "p_load": _probe_load,
    "p_convert": _probe_convert,
    "p_roll": _probe_roll,
    "p_mult_subl": _probe_mult_subl,
    "p_full_dot": _probe_full_dot,
}


@partial(jax.jit, static_argnames=("probe",))
def probe_variant(g_pre, fmap1_padded, fmap2_padded, coords, tile_frame,
                  probe="p_load"):
    E, _, C = g_pre.shape
    F, Hp1, Wp1, _ = fmap1_padded.shape
    _, Hp2, Wp2, _ = fmap2_padded.shape
    n_tiles = E // TILE
    n_live = jnp.full((1,), n_tiles, jnp.int32)

    x0a, bya, ria, dxa, dya = cp._window_meta(coords, Hp1, Wp1)
    x0b, byb, rib, dxb, dyb = cp._window_meta(coords / 4.0, Hp2, Wp2)

    smem = dict(memory_space=pltpu.SMEM)
    sspec = pl.BlockSpec((TILE, P2), lambda i, tf, nl: (i, 0), **smem)
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
        # constant out index map: every tile overwrites the same block,
        # so output HBM traffic doesn't swamp the probed compute
        out_specs=pl.BlockSpec((TILE, 2, P2, D, C),
                               lambda i, tf, nl: (0, 0, 0, 0, 0)),
    )
    kernel, _ = _mk_probe(PROBES[probe], None)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((TILE, 2, P2, D, C), jnp.float32),
        grid_spec=grid_spec,
    )(tile_frame, n_live, x0a, bya, ria,
      dxa.astype(jnp.float32), dya.astype(jnp.float32),
      x0b, byb, rib, dxb.astype(jnp.float32), dyb.astype(jnp.float32),
      g_pre, fmap1_padded, fmap2_padded)


def probe(E):
    from microbench import timed
    g, f1, f2, coords, tf = make_inputs(E)
    for name in PROBES:
        try:
            fn = partial(probe_variant, g, f1, f2, coords, probe=name)
            timed(f"{name} E={E}", fn, tf, reps=8)
        except Exception as ex:
            print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:160]}")


@partial(jax.jit, static_argnames=("variant", "interpret", "out_dtype"))
def fused_variant(g_pre, fmap1_padded, fmap2_padded, coords, tile_frame,
                  n_live=None, variant="v4", interpret=False,
                  out_dtype=None):
    E, _, C = g_pre.shape
    F, Hp1, Wp1, _ = fmap1_padded.shape
    _, Hp2, Wp2, _ = fmap2_padded.shape
    n_tiles = E // TILE
    if n_live is None:
        n_live = jnp.full((1,), n_tiles, jnp.int32)
    else:
        n_live = jnp.asarray(n_live, jnp.int32).reshape(1)
    out_dtype = out_dtype or jnp.float32

    x0a, bya, ria, dxa, dya = cp._window_meta(coords, Hp1, Wp1)
    x0b, byb, rib, dxb, dyb = cp._window_meta(coords / 4.0, Hp2, Wp2)

    smem = dict(memory_space=pltpu.SMEM)
    sspec = pl.BlockSpec((TILE, P2), lambda i, tf, nl: (i, 0), **smem)
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
        KERNELS[variant],
        out_shape=jax.ShapeDtypeStruct((E, 2, P2, D - 1, D - 1),
                                       out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_frame, n_live, x0a, bya, ria,
      dxa.astype(jnp.float32), dya.astype(jnp.float32),
      x0b, byb, rib, dxb.astype(jnp.float32), dyb.astype(jnp.float32),
      g_pre, fmap1_padded, fmap2_padded)


def make_inputs(E, mem=20, seed=0):
    H1, W1, H2, W2, C = 120, 160, 30, 40, 128
    Hp1, Wp1 = cp.padded_hw(H1, W1)
    Hp2, Wp2 = cp.padded_hw(H2, W2)
    rng = np.random.default_rng(seed)
    g = jnp.asarray(rng.standard_normal((E, P2, C)), jnp.bfloat16)
    f1 = jnp.asarray(rng.standard_normal((mem, Hp1, Wp1, C)) * 0.3,
                     jnp.bfloat16)
    f2 = jnp.asarray(rng.standard_normal((mem, Hp2, Wp2, C)) * 0.3,
                     jnp.bfloat16)
    coords = jnp.asarray(
        np.stack([rng.uniform(-5, W1 + 5, (E, 3, 3)),
                  rng.uniform(-5, H1 + 5, (E, 3, 3))], axis=1),
        jnp.float32)
    tf = jnp.sort(jnp.asarray(rng.integers(0, mem, (E // TILE,)),
                              jnp.int32))
    return g, f1, f2, coords, tf


def check():
    g, f1, f2, coords, tf = make_inputs(32, mem=3)
    ref = fused_variant(g, f1, f2, coords, tf, variant="v4",
                        interpret=True)
    for v in ("v6a", "v6b", "v6c", "v7"):
        out = fused_variant(g, f1, f2, coords, tf, variant=v,
                            interpret=True)
        d = np.abs(np.asarray(out, np.float32)
                   - np.asarray(ref, np.float32))
        rel = d.max() / (np.abs(np.asarray(ref, np.float32)).max() + 1e-9)
        exact = "EXACT" if d.max() == 0 else f"maxrel {rel:.2e}"
        print(f"{v}: {exact}")
    try:
        out = v12_to_ref(v12_variant(g, f1, f2, coords, tf,
                                     interpret=True))
        d = np.abs(out - np.asarray(ref, np.float32))
        rel = d.max() / (np.abs(np.asarray(ref, np.float32)).max() + 1e-9)
        print(f"v12: {'EXACT' if d.max() == 0 else f'maxrel {rel:.2e}'}")
    except Exception as ex:
        print(f"v12: FAILED {type(ex).__name__}: {str(ex)[:200]}")
    for v in V10_KERNELS:
        try:
            out = v10_to_ref(v10_variant(g, f1, f2, coords, tf,
                                         variant=v, interpret=True))
            d = np.abs(out - np.asarray(ref, np.float32))
            rel = d.max() / (np.abs(np.asarray(ref, np.float32)).max()
                             + 1e-9)
            exact = "EXACT" if d.max() == 0 else f"maxrel {rel:.2e}"
            print(f"{v}: {exact}")
        except Exception as ex:
            print(f"{v}: FAILED {type(ex).__name__}: {str(ex)[:200]}")


def bench(E, variants=None, fast=False):
    from microbench import timed
    g, f1, f2, coords, tf = make_inputs(E)
    # compile-and-compare first (f32 out for exactness), then time;
    # fast=True skips the v4 reference compile (timing only)
    ref = None
    if not fast:
        ref = np.asarray(
            fused_variant(g, f1, f2, coords, tf, variant="v4"),
            np.float32)
    for v in (variants or list(KERNELS) + ["v9"]):
        try:
            if v in V10_KERNELS:
                if ref is not None:
                    out = v10_to_ref(v10_variant(g, f1, f2, coords, tf,
                                                 variant=v))
                    dmax = np.abs(out - ref).max()
                    rel = dmax / (np.abs(ref).max() + 1e-9)
                    tag = "EXACT" if dmax == 0 else f"maxrel {rel:.2e}"
                    print(f"fused {v}: {tag}", flush=True)
                    if rel > 2e-2:
                        print(f"fused {v}: REJECTED (wrong)", flush=True)
                        continue
                fn = partial(v10_variant, g, f1, f2, coords,
                             variant=v, out_dtype=jnp.bfloat16)
                timed(f"fused {v} E={E}", fn, tf, reps=8)
                continue
            if v == "v12":
                if ref is not None:
                    out = v12_to_ref(v12_variant(g, f1, f2, coords, tf))
                    dmax = np.abs(out - ref).max()
                    rel = dmax / (np.abs(ref).max() + 1e-9)
                    tag = "EXACT" if dmax == 0 else f"maxrel {rel:.2e}"
                    print(f"fused v12: {tag}", flush=True)
                    if rel > 2e-2:
                        print("fused v12: REJECTED (wrong)", flush=True)
                        continue
                fn = partial(v12_variant, g, f1, f2, coords,
                             out_dtype=jnp.bfloat16)
                timed(f"fused v12 E={E}", fn, tf, reps=8)
                continue
            if v == "v9":
                # v9 lives in the shipped module (corr_pallas_fused)
                if ref is not None:
                    out = np.asarray(cp.corr_pallas_fused(
                        g, f1, f2, coords, tf, version=9), np.float32)
                    dmax = np.abs(out - ref).max()
                    tag = ("EXACT" if dmax == 0
                           else f"maxrel {dmax / (np.abs(ref).max()):.2e}")
                    print(f"fused v9: {tag}", flush=True)
                fn = partial(cp.corr_pallas_fused, g, f1, f2, coords,
                             version=9, out_dtype=jnp.bfloat16)
                timed(f"fused v9 E={E}", fn, tf, reps=8)
                continue
            if ref is not None:
                out = np.asarray(
                    fused_variant(g, f1, f2, coords, tf, variant=v),
                    np.float32)
                dmax = np.abs(out - ref).max()
                rel = dmax / (np.abs(ref).max() + 1e-9)
                tag = "EXACT" if dmax == 0 else f"maxrel {rel:.2e}"
                print(f"fused {v}: {tag}", flush=True)
                if rel > 2e-2:
                    print(f"fused {v}: REJECTED (wrong)", flush=True)
                    continue
            fn = partial(fused_variant, g, f1, f2, coords,
                         variant=v, out_dtype=jnp.bfloat16)
            timed(f"fused {v} E={E}", fn, tf, reps=8)
        except Exception as ex:  # Mosaic compile failures are expected
            print(f"fused {v} E={E}: FAILED {type(ex).__name__}: "
                  f"{str(ex)[:200]}", flush=True)


if __name__ == "__main__":
    if "check" in sys.argv[1:]:
        check()
    elif "probe" in sys.argv[1:]:
        E = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 16384
        probe(E)
    else:
        E = int(sys.argv[1]) if len(sys.argv) > 1 and \
            sys.argv[1].isdigit() else 49152
        fast = "fast" in sys.argv
        names = [a for a in sys.argv[2:]
                 if not a.isdigit() and a != "fast"] or None
        bench(E, variants=names, fast=fast)
