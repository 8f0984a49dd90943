"""Recurrent update operator (flax.linen).

Rebuild of the reference's ``Update`` module (ref dpvo/net.py:23-88):
correlation MLP encoder, temporal-neighbor message passing (c1/c2),
SoftAgg over patch groups (kk) and frame-pair groups (ii*12345+jj), a
2-layer gated-residual "GRU", and the flow-delta / confidence heads.

TPU-native differences: the neighbor indices come from the on-device
argsort in ``ops.graph.neighbors`` (no CPU sync — the reference round-trips
through fastba.neighbors / ba.cpp:59-97 every step), and group ids for the
scatter attentions are computed with static-capacity ``compactify``.
All edges are masked by ``valid`` so the module runs on fixed-capacity
padded edge tables.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..ops import graph, scatter
from .blocks import GatedResidual, SoftAgg, grad_clip

DIM = 384  # ref net.py:21


class CorrDense(nn.Module):
    """The corr encoder's first Dense layer, with a lazy raw-layout
    input form.

    Param tree is identical to ``nn.Dense`` (kernel (2*49*p*p, DIM),
    bias), so checkpoints are unaffected.  ``corr`` is either the
    reference's interleaved (E, 2*49*p*p) feature array, or a tuple
    ``("raw", feat, inv)`` where ``feat`` (Es, 2*49*p*p) carries the
    Pallas kernel's untransposed (level, p, dy, dx) feature order over
    the corr-sorted edge table; kernel ROWS are reordered to match
    (matmul row reindexing is exact).

    Measured note: with the fused two-level kernel emitting bf16 in raw
    layout, the raw form WINS: 9.7 -> 8.6 ms for the corr block at
    Es=15k (the ref-layout path paid two bf16 relayout copies + the
    interleave before the matmul; an earlier f32 two-call variant of
    the raw path had measured 2 ms slower).  The engine's Pallas path
    passes the tuple form; the XLA path passes the interleaved array.
    """
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, corr):
        from ..ops.corr_pallas import RAW_DIM
        raw = isinstance(corr, tuple)
        in_dim = corr[1].shape[-1] if raw else corr.shape[-1]
        # the param is ALWAYS checkpoint-shaped (2*49*p*p rows); raw
        # forms remap rows to their feature layout at apply time
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2 * RAW_DIM if raw else in_dim,
                             self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        b = bias.astype(self.dtype)
        if raw:
            from ..ops.corr_pallas import (raw_to_ref_perm, v10_row_map,
                                           v12_row_map, RAW_DIM, V10_DIM,
                                           V12_DIM)
            if corr[0] == "enc":
                # v13 fused kernel already applied this layer's matmul
                # in-kernel (corr_pallas._kernel_fused_v13 consumes the
                # row-mapped kernel); only bias + inverse-permute remain
                _, feat, inv = corr
                return (feat.astype(self.dtype) + b)[inv]
            _, feat, inv = corr
            if in_dim in (V10_DIM, V12_DIM):
                # v10/v12 kernel layouts: (p, level, dy, dx) lanes with
                # dead positions; dead rows gather an appended ZERO row
                # so the matmul stays exact (v10's dead features are
                # zero; v12's carry wrap garbage that the zero row
                # annihilates)
                rows = (v10_row_map() if in_dim == V10_DIM
                        else v12_row_map())
                kz = jnp.concatenate(
                    [kernel, jnp.zeros((1, self.features), kernel.dtype)])
                k = kz[jnp.asarray(rows)].astype(self.dtype)
            else:
                assert in_dim == 2 * RAW_DIM, in_dim
                k = kernel[jnp.asarray(raw_to_ref_perm())].astype(
                    self.dtype)
            return (feat.astype(self.dtype) @ k + b)[inv]
        return corr.astype(self.dtype) @ kernel.astype(self.dtype) + b


class Update(nn.Module):
    p: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, ii, jj, kk, valid=None,
                 agg_meta=None, nbrs=None, shard_ctx=None,
                 compact_meta=None, g_cap=None):
        """One recurrent update.

        net   (E, DIM)  hidden state per edge
        inp   (E, DIM)  context features (imap[kk])
        corr  (E, 2*49*p*p) flattened correlation features
        ii, jj, kk (E,) int32 edge lists; valid (E,) bool mask
        agg_meta optional (meta_kk, meta_ij) sort metadata tuples
                 (perm, inv_perm, start, end) enabling the scatter-free
                 sorted-segment attention path
        compact_meta optional (cm_kk, cm_ij) compact-rank metadata
                 tuples (perm, gid_sorted, gid_orig) with static
                 ``g_cap`` — the fastest path: per-group Pallas
                 reductions (ops.agg_pallas); takes precedence over
                 agg_meta
        shard_ctx optional (axis_name, gid_ij, g_cap): edge-sharded
                 inference inside ``shard_map`` — agg_kk stays
                 shard-local (the edge partitioner never splits a patch
                 group across shards, parallel/infer_step.py), agg_ij
                 reduces over the mesh with globally consistent dense
                 pair ids ``gid_ij`` in [0, g_cap)
        -> (net', delta (E, 2) fp32, weight (E, 2) fp32)
        """
        E = net.shape[0]
        if valid is None:
            valid = jnp.ones((E,), dtype=bool)
        dt = self.dtype

        net = net.astype(dt)
        # corr encoder (ref net.py:49-56); see CorrDense for the lazy
        # two-level input form
        c = CorrDense(DIM, dt, name="corr1")(corr)
        c = nn.relu(c)
        c = nn.Dense(DIM, dtype=dt, name="corr2")(c)
        c = nn.LayerNorm(epsilon=1e-3, dtype=dt, name="corr_norm")(c)
        c = nn.relu(c)
        c = nn.Dense(DIM, dtype=dt, name="corr3")(c)

        net = net + inp.astype(dt) + c
        net = nn.LayerNorm(epsilon=1e-3, dtype=dt, name="norm")(net)

        # temporal message passing (ref net.py:76-81); host-precomputed
        # neighbor indices skip the on-device sort
        if nbrs is not None:
            ix, jx = nbrs
        else:
            ix, jx = graph.neighbors(kk, jj, valid)
        mask_ix = (ix >= 0)[:, None].astype(dt)
        mask_jx = (jx >= 0)[:, None].astype(dt)

        # sequential like the reference (net.py:76-77): the jx gather
        # sees the state AFTER the c1 residual
        net_ix = net[jnp.maximum(ix, 0)] * mask_ix
        h = nn.Dense(DIM, dtype=dt, name="c1_0")(net_ix)
        h = nn.relu(h)
        net = net + nn.Dense(DIM, dtype=dt, name="c1_1")(h)

        net_jx = net[jnp.maximum(jx, 0)] * mask_jx
        h = nn.Dense(DIM, dtype=dt, name="c2_0")(net_jx)
        h = nn.relu(h)
        net = net + nn.Dense(DIM, dtype=dt, name="c2_1")(h)

        # group attention (ref net.py:83-84)
        if shard_ctx is not None:
            axis_name, gid_ij, g_cap = shard_ctx
            _, ku = scatter.compactify(
                jnp.where(valid, kk, jnp.iinfo(jnp.int32).max), size=E)
            net = net + SoftAgg(DIM, dt, name="agg_kk")(net, ku, E, valid)
            net = net + SoftAgg(DIM, dt, name="agg_ij")(
                net, gid_ij, g_cap, valid, shard_axis=axis_name)
        elif compact_meta is not None:
            cm_kk, cm_ij = compact_meta
            net = net + SoftAgg(DIM, dt, name="agg_kk")(
                net, compact_meta=cm_kk, g_cap=g_cap)
            net = net + SoftAgg(DIM, dt, name="agg_ij")(
                net, compact_meta=cm_ij, g_cap=g_cap)
        elif agg_meta is not None:
            meta_kk, meta_ij = agg_meta
            net = net + SoftAgg(DIM, dt, name="agg_kk")(
                net, sorted_meta=meta_kk)
            net = net + SoftAgg(DIM, dt, name="agg_ij")(
                net, sorted_meta=meta_ij)
        else:
            _, ku = scatter.compactify(
                jnp.where(valid, kk, jnp.iinfo(jnp.int32).max), size=E)
            pair = jnp.where(valid, ii * 12345 + jj,
                             jnp.iinfo(jnp.int32).max)
            _, pu = scatter.compactify(pair, size=E)
            net = net + SoftAgg(DIM, dt, name="agg_kk")(net, ku, E, valid)
            net = net + SoftAgg(DIM, dt, name="agg_ij")(net, pu, E, valid)

        # "GRU" (ref net.py:42-47)
        net = nn.LayerNorm(epsilon=1e-3, dtype=dt, name="gru_norm1")(net)
        net = GatedResidual(DIM, dt, name="gru_res1")(net)
        net = nn.LayerNorm(epsilon=1e-3, dtype=dt, name="gru_norm2")(net)
        net = GatedResidual(DIM, dt, name="gru_res2")(net)

        # heads (ref net.py:58-67): computed in the compute dtype like
        # the reference's autocast region, outputs fp32 like the
        # caller's .float() — the f32 path cost two (E, 384) f32
        # materializations per update at the retain bucket
        hd = nn.relu(net)
        delta = nn.Dense(2, dtype=dt, name="d")(hd).astype(jnp.float32)
        delta = grad_clip(delta)
        w = nn.Dense(2, dtype=dt, name="w")(hd).astype(jnp.float32)
        w = nn.sigmoid(grad_clip(w))

        vm = valid[:, None]
        return (jnp.where(vm, net, 0.0),
                jnp.where(vm, delta, 0.0),
                jnp.where(vm, w, 0.0))
