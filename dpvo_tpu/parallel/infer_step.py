"""Edge-sharded SLAM inference over a device mesh.

The tracking hot loop (reproject -> correlate -> recurrent update ->
BA; ref dpvo/dpvo.py:328-356) is bounded by per-edge work.  This module
shards the EDGE dimension over a 1-D ``("edges",)`` mesh, implementing
the design in docs/MULTICHIP.md:

- poses / patches / intrinsics / feature ring buffers: replicated;
- edge tables (ii/jj/kk/net/target/weight/valid): sharded, with edges
  partitioned by PATCH so both the patch-group attention (agg_kk) and
  the temporal-neighbor pass (groups share kk) stay shard-local
  (``shard_edges_by_patch``);
- frame-pair attention (agg_ij): dense per-group accumulators reduced
  with pmax/psum (SoftAgg's ``shard_axis`` path, models/blocks.py);
- bundle adjustment: per-shard normal-equation partials, one ~1.6 MB
  psum, then every shard solves the same small Schur system redundantly
  (``ops.ba.ba_iterative_sharded``) — no per-edge data crosses chips;
- correlation: shard-local gathers from the replicated ring buffers.

The single-chip engine path is untouched; this is the scale-out story
(a new capability — the reference is strictly single-GPU, SURVEY.md
§2.2).  Validated on a CPU mesh by ``__graft_entry__.
dryrun_multichip_infer`` and tests/test_infer_sharded.py, which check
the sharded outputs against the single-device ``kernels.update_step``.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INT_MAX = jnp.iinfo(jnp.int32).max


def shard_edges_by_patch(ii, jj, kk, n_shards, e_shard=None, k_cap=None):
    """Partition edges into ``n_shards`` equal slices without splitting
    a patch group (host-side, numpy).

    Sorts edges by ``kk`` and cuts the sorted order at patch-group
    boundaries so all edges of one patch land on one shard — the
    invariant that keeps agg_kk and the temporal-neighbor pass
    shard-local.  Returns (perm, valid) where ``perm`` (n_shards *
    e_shard,) indexes into the input edge arrays (padded slots repeat
    edge 0) and ``valid`` marks real rows.

    Raises if any single patch group exceeds ``e_shard`` edges (cannot
    be placed) — patch groups are <= PATCH_LIFETIME * 2 edges in the
    tracking loop, far below any sane shard size.

    Pass ``k_cap`` (the value later given to ``make_sharded_update_step``)
    to validate the live-patch-id span up front: ``ba_iterative_sharded``
    maps patch slots with a GLOBAL dense ``kk - min(kk)`` mapping, so a
    span >= k_cap would silently zero-weight the overflowing edges and
    quietly diverge from the single-device result.
    """
    kk = np.asarray(kk)
    E = len(kk)
    if k_cap is not None and E > 0:
        span_kk = int(kk.max()) - int(kk.min()) + 1
        if span_kk > k_cap:
            raise ValueError(
                f"live patch-id span {span_kk} exceeds k_cap {k_cap}; "
                f"ba_iterative_sharded's dense kk - min(kk) slot mapping "
                f"would drop edges — raise k_cap or retire old edges")
    order = np.argsort(kk, kind="stable")
    ks = kk[order]
    # boundary[i] = True where a new patch group starts at sorted pos i
    new_grp = np.empty(E, bool)
    new_grp[0] = True
    new_grp[1:] = ks[1:] != ks[:-1]
    grp_start = np.nonzero(new_grp)[0]
    grp_end = np.append(grp_start[1:], E)
    grp_size = grp_end - grp_start

    if e_shard is None:
        # slack of one max-size group per shard: the greedy fill wastes
        # fewer than max-group slots per shard boundary, so this always
        # places (rounded up to a multiple of 8 lanes)
        e_shard = int(-(-E // n_shards)) + int(grp_size.max(initial=1))
        e_shard = -(-e_shard // 8) * 8
    if grp_size.max(initial=0) > e_shard:
        raise ValueError(
            f"a patch group of {grp_size.max()} edges exceeds the shard "
            f"capacity {e_shard}")

    shards = [[] for _ in range(n_shards)]
    s = 0
    for g0, g1 in zip(grp_start, grp_end):
        while s < n_shards - 1 and len(shards[s]) + (g1 - g0) > e_shard:
            s += 1
        if len(shards[s]) + (g1 - g0) > e_shard:
            raise ValueError(
                f"cannot place {E} edges into {n_shards} shards of "
                f"{e_shard} (greedy fill overflowed the last shard)")
        shards[s].extend(order[g0:g1].tolist())

    perm = np.zeros(n_shards * e_shard, np.int64)
    valid = np.zeros(n_shards * e_shard, bool)
    for s, rows in enumerate(shards):
        perm[s * e_shard:s * e_shard + len(rows)] = rows
        valid[s * e_shard:s * e_shard + len(rows)] = True
    return perm, valid


def make_sharded_update_step(update_mod, mesh, *, M, pmem, mem, n_cap,
                             k_cap, span=64, iterations=2,
                             axis="edges"):
    """Build the jitted edge-sharded update step.

    ``span`` statically bounds the live frame window (frame-pair group
    ids are dense (ii - t_lo) * span + (jj - t_lo) slots, t_lo the
    mesh-wide min live frame) — REMOVAL_WINDOW + PATCH_LIFETIME in the
    tracking loop, far below the default 64.

    The returned function mirrors ``kernels.update_step`` with
    pre-sharded edge arrays (see ``shard_edges_by_patch``):

        f(params, poses, patches, intrinsics, imap, gmap, fmap1, fmap2,
          net, target, weight, ii, jj, kk, valid, t0, t1)
        -> (net', target', weight', delta, poses', patches')
    """
    from ..engine.kernels import _corr_features
    from ..ops import graph
    from ..ops import projective as pops
    from ..ops import ba

    g_cap = span * span
    repl = P()
    edge = P(axis)

    def body(params, poses, patches, intrinsics, imap, gmap, fmap1,
             fmap2, net, target, weight, ii, jj, kk, valid, t0, t1):
        ii_s = jnp.where(valid, ii, 0)
        jj_s = jnp.where(valid, jj, 0)
        kk_s = jnp.where(valid, kk, 0)

        coords = pops.transform(poses, patches, intrinsics,
                                ii_s, jj_s, kk_s)          # (El, P, P, 2)
        coords2 = coords.transpose(0, 3, 1, 2)

        kk_mod = kk_s % (M * pmem)
        jj_mod = jj_s % mem
        corr_feat = _corr_features(gmap, fmap1, fmap2, coords2,
                                   kk_mod, jj_mod)
        ctx = imap[kk_mod].astype(jnp.float32)

        # globally consistent dense frame-pair ids for agg_ij
        t_lo = jax.lax.pmin(
            jnp.min(jnp.where(valid, jnp.minimum(ii, jj), _INT_MAX)),
            axis)
        pi = ii - t_lo
        pj = jj - t_lo
        ok = valid & (pi >= 0) & (pi < span) & (pj >= 0) & (pj < span)
        gid = jnp.where(ok, pi * span + jnp.clip(pj, 0, span - 1), g_cap)

        nbrs = graph.neighbors(kk, jj, valid)   # shard-local by design
        net, delta, w_out = update_mod.apply(
            params, net, ctx, corr_feat, ii_s, jj_s, kk_s, valid,
            nbrs=nbrs, shard_ctx=(axis, gid, g_cap))

        c = coords.shape[1] // 2
        target = coords[:, c, c] + delta
        target = jnp.where(valid[:, None], target, 0.0)

        poses, patches = ba.ba_iterative_sharded(
            poses, patches, intrinsics[0], target, w_out,
            jnp.float32(1e-4), ii_s, jj_s, kk_s, valid, t0, t1,
            n_cap=n_cap, k_cap=k_cap, iterations=iterations,
            axis_name=axis)

        return net, target, w_out, delta, poses, patches

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(repl, repl, repl, repl, repl, repl, repl, repl,
                  edge, edge, edge, edge, edge, edge, edge, repl, repl),
        out_specs=(edge, edge, edge, edge, repl, repl),
        check_vma=False)
    return jax.jit(fn)
