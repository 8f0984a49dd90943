"""Patch extraction and local correlation (pure JAX reference path).

TPU-native rebuild of the reference's cuda_corr extension
(ref dpvo/altcorr/correlation_kernel.cu + correlation.py):

- ``patchify``: gather D×D×C windows at float coords + 4-tap bilinear blend
  (ref patchify_forward_kernel :18-48 + correlation.py:55-74).
- ``corr``: patch-centric local correlation — for every edge and patch pixel,
  dot products of the patch feature vector against a (2R+2)² integer window
  of the target feature map, then the same 4-tap bilinear blend
  (ref corr_forward_kernel :83-137 + corr_cuda_forward :194-234).

Layout is channels-last (NHWC) throughout: that is the native TPU conv
layout, and it makes the window gathers a contiguous ``take`` over a
(F·H·W, C) view with no transposition.  Instead of one-CUDA-thread-per-tap
with atomics, the JAX formulation is a `lax.scan` over the D² window
offsets: each step is one fused gather+multiply+reduce over all edges,
keeping the transient footprint at E·P²·C elements.  Autodiff provides the
backward pass (the reference hand-writes scatter-add kernels,
correlation_kernel.cu:140-191).

Feature ordering of the flattened correlation output matches the CUDA
reference exactly (x-offset, y-offset, patch-y, patch-x, level) so torch
checkpoints can be imported for parity testing.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _bilinear_blend(vals, dx, dy):
    """4-tap blend over the two trailing window axes (size D -> D-1).

    vals (..., Dy, Dx); dx/dy broadcastable fractional offsets.
    Mirrors correlation.py:66-72 / correlation_kernel.cu:228-231.
    """
    v00 = vals[..., :-1, :-1]
    v01 = vals[..., :-1, 1:]
    v10 = vals[..., 1:, :-1]
    v11 = vals[..., 1:, 1:]
    return ((1 - dy) * (1 - dx) * v00 + (1 - dy) * dx * v01
            + dy * (1 - dx) * v10 + dy * dx * v11)


def patchify(net, coords, radius):
    """Extract bilinear patches from feature maps.

    net (N, H, W, C), coords (N, M, 2) float [x, y], radius R
    -> (N, M, 2R+1, 2R+1, C), dtype of ``net``.
    """
    N, H, W, C = net.shape
    M = coords.shape[1]
    R = radius
    D = 2 * R + 2

    coords = coords.astype(jnp.float32)
    base = jnp.floor(coords).astype(jnp.int32)            # (N, M, 2)
    off = coords - base                                    # fractional

    dgrid = jnp.arange(D, dtype=jnp.int32) - R
    iy = base[..., 1, None] + dgrid                        # (N, M, D)
    ix = base[..., 0, None] + dgrid                        # (N, M, D)

    valid = ((iy[..., :, None] >= 0) & (iy[..., :, None] < H)
             & (ix[..., None, :] >= 0) & (ix[..., None, :] < W))  # (N,M,D,D)
    iyc = jnp.clip(iy, 0, H - 1)
    ixc = jnp.clip(ix, 0, W - 1)
    flat = iyc[..., :, None] * W + ixc[..., None, :]       # (N, M, D, D)

    def gather_one(img_flat, idx):
        # img_flat (H*W, C), idx (M, D, D) -> (M, D, D, C)
        return jnp.take(img_flat, idx.reshape(-1), axis=0).reshape(
            M, D, D, C)

    out = jax.vmap(gather_one)(net.reshape(N, H * W, C), flat)
    out = out * valid[..., None].astype(net.dtype)

    # blend over the (D, D) window axes: move C ahead of them temporarily
    dx = off[..., 0][:, :, None, None, None].astype(net.dtype)  # (N,M,1,1,1)
    dy = off[..., 1][:, :, None, None, None].astype(net.dtype)
    blended = _bilinear_blend(out.transpose(0, 1, 4, 2, 3), dx, dy)
    return blended.transpose(0, 1, 3, 4, 2)


@partial(jax.jit, static_argnames=("radius", "pad"))
def corr(gmap, fmap, coords, kidx, fidx, radius=3, pad=0):
    """Local correlation volume.

    gmap   (K, P, P, C)  patch features (fmap1 in the reference)
    fmap   (F, Hp, Wp, C)  target feature maps (one pyramid level),
           optionally stored with a zero border of >= ``pad`` pixels on
           every side (corr_pallas.pad_fmap geometry; the engine keeps
           ring buffers zero-padded for the Pallas path).  With pad > 0
           the bounds masking happens by clamping taps into the zero
           border instead of an explicit mask — identical results.
    coords (E, 2, P, P)  float reprojected patch coords [x, y] in
           UNPADDED fmap pixels
    kidx   (E,) int      patch index into gmap (``us`` in the CUDA kernel)
    fidx   (E,) int      frame index into fmap (``vs``)
    -> (E, 2R+1, 2R+1, P, P) fp32, ordered [x_off, y_off, py, px] to match
       the reference's final permute (correlation_kernel.cu:233).
    """
    E, _, P, _ = coords.shape
    K, _, _, C = gmap.shape
    F, Hp, Wp, _ = fmap.shape
    H, W = Hp - 2 * pad, Wp - 2 * pad  # only used when pad == 0
    R = radius
    D = 2 * R + 2

    coords = coords.astype(jnp.float32)
    cx, cy = coords[:, 0], coords[:, 1]                    # (E, P, P)
    bx = jnp.floor(cx).astype(jnp.int32)
    by = jnp.floor(cy).astype(jnp.int32)
    dx = (cx - bx)[:, None, None]                          # (E, 1, 1, P, P)
    dy = (cy - by)[:, None, None]

    g = gmap[kidx].astype(jnp.float32)                     # (E, P, P, C)
    base_flat = fidx[:, None, None] * (Hp * Wp)            # broadcast (E,1,1)
    fmap_lin = fmap.reshape(F * Hp * Wp, C)

    offs = jnp.stack(jnp.meshgrid(jnp.arange(D) - R, jnp.arange(D) - R,
                                  indexing="ij"), axis=-1).reshape(-1, 2)

    def step(carry, o):
        oy, ox = o[0], o[1]
        iy = by + oy
        ix = bx + ox
        if pad > 0:
            # zero-border clamp: out-of-image taps read zeros
            lin = base_flat + jnp.clip(iy + pad, 0, Hp - 1) * Wp \
                + jnp.clip(ix + pad, 0, Wp - 1)
            f = jnp.take(fmap_lin, lin.reshape(-1), axis=0)
            f = f.reshape(E, P, P, C).astype(jnp.float32)
            s = jnp.einsum("epqc,epqc->epq", g, f, precision=_HI)
        else:
            ok = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
            lin = base_flat + jnp.clip(iy, 0, H - 1) * Wp \
                + jnp.clip(ix, 0, W - 1)
            f = jnp.take(fmap_lin, lin.reshape(-1), axis=0)
            f = f.reshape(E, P, P, C).astype(jnp.float32)
            s = jnp.einsum("epqc,epqc->epq", g, f, precision=_HI)
            s = jnp.where(ok, s, 0.0)
        return carry, s

    _, taps = jax.lax.scan(step, None, offs)               # (D*D, E, P, P)
    vol = taps.reshape(D, D, E, P, P).transpose(2, 3, 4, 0, 1)  # (E,P,P,Dy,Dx)

    out = _bilinear_blend(vol, dx.transpose(0, 3, 4, 1, 2),
                          dy.transpose(0, 3, 4, 1, 2))     # (E,P,P,Dy-1,Dx-1)
    # reorder to (E, x_off, y_off, py, px) per the reference's permute
    return out.transpose(0, 4, 3, 1, 2)


def corr_stack(gmap, pyramid, coords, kidx, fidx, radius=3):
    """Two-level correlation, flattened for the update operator.

    Matches DPVO.corr / CorrBlock.__call__ (ref dpvo.py:200-207,
    net.py:165-169): level l uses coords / l, and levels stack on the last
    axis before flattening -> (E, L*(2R+1)^2*P*P) fp32.
    """
    E = coords.shape[0]
    outs = []
    for lvl, fmap in pyramid:
        outs.append(corr(gmap, fmap, coords / lvl, kidx, fidx, radius))
    stacked = jnp.stack(outs, axis=-1)                     # (E,Dx,Dy,P,P,L)
    return stacked.reshape(E, -1)


def avg_pool2d(x, k):
    """Average pooling with stride = kernel, NHWC (ref utils.pyramidify)."""
    if k == 1:
        return x
    *lead, H, W, C = x.shape
    xr = x.reshape(*lead, H // k, k, W // k, k, C)
    return xr.mean(axis=(-4, -2))
