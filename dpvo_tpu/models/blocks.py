"""Neural network building blocks (flax.linen).

Rebuild of the reference's dpvo/blocks.py: GatedResidual, SoftAgg,
gradient-surgery ops.  Scatter attention uses static-capacity segment ids
(XLA needs static shapes) and the gradient ops are `jax.custom_vjp`
instead of torch autograd.Functions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import scatter

# ref blocks.py:72
GRAD_CLIP = 0.1


# --- gradient surgery (ref blocks.py:74-107) -------------------------------

@jax.custom_vjp
def grad_clip(x):
    """Identity fwd; bwd: NaN->0 then clamp to ±0.01 (ref GradClip)."""
    return x


def _grad_clip_fwd(x):
    return x, None


def _grad_clip_bwd(_, g):
    g = jnp.where(jnp.isnan(g), 0.0, g)
    return (jnp.clip(g, -0.01, 0.01),)


grad_clip.defvjp(_grad_clip_fwd, _grad_clip_bwd)


@jax.custom_vjp
def grad_zero(x):
    """Identity fwd; bwd: NaN->0 and |g| > GRAD_CLIP -> 0 (ref GradZero)."""
    return x


def _grad_zero_fwd(x):
    return x, None


def _grad_zero_bwd(_, g):
    g = jnp.where(jnp.isnan(g), 0.0, g)
    g = jnp.where(jnp.abs(g) > GRAD_CLIP, 0.0, g)
    return (g,)


grad_zero.defvjp(_grad_zero_fwd, _grad_zero_bwd)


@jax.custom_vjp
def grad_mag(x):
    """Identity fwd; bwd prints mean |grad| (ref blocks.py:110-118
    GradMag — a debug probe, unused by the reference model itself).
    Wrap any intermediate with it to see that tensor's incoming
    gradient magnitude during training."""
    return x


def _grad_mag_fwd(x):
    return x, None


def _grad_mag_bwd(_, g):
    jax.debug.print("grad_mag: {m}", m=jnp.mean(jnp.abs(g)))
    return (g,)


grad_mag.defvjp(_grad_mag_fwd, _grad_mag_bwd)


# --- modules ---------------------------------------------------------------

class GatedResidual(nn.Module):
    """x + sigmoid(W_g x) * MLP(x)  (ref blocks.py:15-29)."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gate = nn.sigmoid(nn.Dense(self.dim, dtype=self.dtype,
                                   name="gate")(x))
        res = nn.Dense(self.dim, dtype=self.dtype, name="res1")(x)
        res = nn.relu(res)
        res = nn.Dense(self.dim, dtype=self.dtype, name="res2")(res)
        return x + gate * res


class SoftAgg(nn.Module):
    """Scatter-softmax attention pooling over groups, re-broadcast
    (ref blocks.py:31-48).

    The torch version computes group ids with ``torch.unique``; here the
    caller passes precomputed segment ids ``jx`` in [0, num_groups) plus a
    validity mask — invalid rows are routed to a trash group and contribute
    nothing.
    """
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, jx=None, num_groups=None, valid=None,
                 sorted_meta=None, shard_axis=None, compact_meta=None,
                 g_cap=None):
        if compact_meta is not None:
            # compact path: reductions land on per-GROUP rows (Pallas
            # segmented dual-sum on TPU, see ops.agg_pallas), the output
            # projection runs at group granularity, and ONE row gather
            # broadcasts back — measured 4.3 -> ~1.5 ms per SoftAgg at
            # the 45k-edge retain bucket vs the sorted-cumsum path.
            from ..ops import agg_pallas
            perm, gid_sorted, gid_orig = compact_meta
            x_s = x[perm]
            f = nn.Dense(self.dim, dtype=self.dtype, name="f")(x_s)
            g = nn.Dense(self.dim, dtype=self.dtype, name="g")(x_s)
            g32 = g.astype(jnp.float32)
            # global per-column shift: constant within every group, so
            # the softmax is invariant to it (same as the sorted path)
            shift = jax.lax.stop_gradient(
                jnp.max(g32, axis=0, keepdims=True))
            E = x_s.shape[0]
            use_kernel = (jax.default_backend() == "tpu"
                          and E % agg_pallas.BLK == 0)
            fn = (agg_pallas.segment_softmax_sums if use_kernel
                  else agg_pallas.segment_softmax_sums_xla)
            T = fn(g32, f.astype(jnp.float32), shift, gid_sorted,
                   g_cap)                       # (G_pad, 2*dim) f32
            Y = T[:, self.dim:] / jnp.maximum(T[:, :self.dim], 1e-12)
            h = nn.Dense(self.dim, dtype=self.dtype,
                         name="h")(Y.astype(self.dtype))
            return h[gid_orig]

        f = nn.Dense(self.dim, dtype=self.dtype, name="f")(x)
        g = nn.Dense(self.dim, dtype=self.dtype, name="g")(x)

        if shard_axis is not None:
            # cross-shard path (edge-sharded inference, shard_map over
            # ``shard_axis``): groups may span shards, so ``jx`` must be
            # GLOBALLY consistent dense ids in [0, num_groups).  The
            # segment softmax runs in three collectives over the mesh:
            # pmax of per-group maxima (stability), psum of exp sums,
            # psum of exp-weighted value sums — same math as
            # scatter_softmax + scatter_sum, reduction order aside.
            S = num_groups + 1
            if valid is not None:
                jx = jnp.where(valid, jx, num_groups)
            g32 = g.astype(jnp.float32)
            m = jax.ops.segment_max(g32, jx, num_segments=S)
            m = jax.lax.pmax(m, shard_axis)
            m = jnp.where(jnp.isfinite(m), m, 0.0)
            e = jnp.exp(g32 - m[jx])
            denom = jax.lax.psum(
                jax.ops.segment_sum(e, jx, num_segments=S), shard_axis)
            w = e / jnp.maximum(denom, 1e-12)[jx]
            y = jax.lax.psum(
                jax.ops.segment_sum(f.astype(jnp.float32) * w, jx,
                                    num_segments=S), shard_axis)
            h = nn.Dense(self.dim, dtype=self.dtype,
                         name="h")(y.astype(self.dtype))
            return h[jx]

        if sorted_meta is not None:
            # fast path: host supplies sort metadata; segment reductions
            # become cumsum differences (no TPU scatter)
            perm, inv_perm, start, end = sorted_meta
            gs = g[perm].astype(jnp.float32)
            fs = f[perm].astype(jnp.float32)
            y_rows = scatter.sorted_segment_softmax_sum(gs, fs, start, end)
            h = nn.Dense(self.dim, dtype=self.dtype,
                         name="h")(y_rows.astype(self.dtype))
            return h[inv_perm]

        # generic path: scatter-based segments with a trash group
        if valid is not None:
            jx = jnp.where(valid, jx, num_groups)
        S = num_groups + 1
        # softmax weights computed in fp32 for stability
        w = scatter.scatter_softmax(g.astype(jnp.float32), jx, S)
        y = scatter.scatter_sum(f * w.astype(f.dtype), jx, S)
        h = nn.Dense(self.dim, dtype=self.dtype, name="h")(y)
        return h[jx]


class LayerNorm1D(nn.Module):
    """LayerNorm with eps=1e-4 (ref blocks.py:7-13)."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-4, dtype=self.dtype)(x)
