"""Jitted device kernels for the SLAM engine.

Each function here is one XLA program with static shapes; the host engine
(``engine.dpvo.DPVO``) orchestrates them.  They rebuild, TPU-natively, the
pieces the reference spreads across CUDA extensions and torch code:

- ``process_frame``   — Patchifier forward on one frame (ref net.py:106-153)
- ``write_frame``     — ring-buffer/state writes + motion model + depth init
                        (ref dpvo.py:398-438)
- ``update_step``     — the hot loop: reproject, two-level correlation,
                        recurrent update, local BA (ref dpvo.py:328-356)
- ``motion_probe``    — initialization motion check (ref dpvo.py:240-255)
- ``flowmag_pair``    — keyframe motion magnitude (ref dpvo.py:257-264)
- ``compact_frames``  — keyframe removal buffer shift (ref dpvo.py:280-300)
- ``permute_edges``   — edge-table compaction by host-computed permutation
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import lie, projective as pops, corr as corr_ops, ba
from ..ops import corr_pallas as cp
from ..models.vonet import Patchifier, image_gradient
from ..models.update import Update, DIM


# ---------------------------------------------------------------------------
# frame feature extraction
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("patchifier",))
def process_frame(params, patchifier: Patchifier, image, coords):
    """One frame through the Patchifier.

    image  (H, W, 3) float32 normalized (BGR, ref dpvo.py:389)
    coords (M, 2) float32 centroids at feature resolution
    Returns fmap1 (h, w, 128), fmap2 (h/4, w/4, 128), gmap (M, P, P, 128),
    imap (M, DIM), patches (M, 3, P, P) f32, clr (M, 3) u8.
    """
    fmap, gmap, imap, patches, _, clr = patchifier.apply(
        params, image[None], coords[None])
    fmap1 = fmap[0]
    fmap2 = corr_ops.avg_pool2d(fmap[0], 4)
    clr_u8 = jnp.clip((clr[0][:, ::-1] + 0.5) * (255.0 / 2), 0, 255
                      ).astype(jnp.uint8)
    return fmap1, fmap2, gmap[0], imap[0], patches[0].astype(jnp.float32), \
        clr_u8


# ---------------------------------------------------------------------------
# state writes for a new frame
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("M", "pmem", "mem", "motion_damping",
                                   "fixed_depth"),
         donate_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def write_frame(poses, patches_buf, intrinsics_buf, colors_buf,
                imap_buf, gmap_buf, fmap1_buf, fmap2_buf,
                fmap1, fmap2, gmap, imap, patches, clr,
                intrinsics, n, fac, is_initialized, rng,
                M, pmem, mem, motion_damping, fixed_depth=None):
    """All device writes for tracking a new frame (ref dpvo.py:398-438).

    n dynamic int32; fac dynamic float (timestamp ratio for the damped
    linear motion model); is_initialized dynamic bool.  fixed_depth
    (static float, test seam) replaces the random pre-init depth with a
    constant so cross-engine parity runs share deterministic state.
    """
    n = jnp.asarray(n, jnp.int32)
    P = patches.shape[-1]

    # --- motion model (ref dpvo.py:410-424) ---
    P1 = poses[jnp.maximum(n - 1, 0)]
    P2 = poses[jnp.maximum(n - 2, 0)]
    xi = motion_damping * fac * lie.se3_log(
        lie.se3_mul(P1, lie.se3_inv(P2)))
    pred = lie.se3_mul(lie.se3_exp(xi), P1)
    new_pose = jnp.where(n > 1, pred, poses[jnp.maximum(n - 1, 0)])
    new_pose = jnp.where(n > 0, new_pose, poses[0])
    poses = poses.at[n].set(new_pose)

    # --- depth init (ref dpvo.py:427-431) ---
    rand_d = (jax.random.uniform(rng, (M, 1, 1)) if fixed_depth is None
              else jnp.full((M, 1, 1), fixed_depth, jnp.float32))
    start = jnp.maximum(n - 3, 0) * M
    recent = jax.lax.dynamic_slice(
        patches_buf, (start, 0, 0, 0), (3 * M, 3, P, P))
    # torch.median of a flattened even-length tensor returns the LOWER
    # middle order statistic, not the average of the two middle values
    # (ref dpvo.py:429); jnp.median would average and shift every
    # post-init depth seed
    flat = jnp.sort(recent[:, 2].reshape(-1))
    med = flat[(flat.shape[0] - 1) // 2]
    depth = jnp.where(is_initialized, jnp.full((M, 1, 1), med), rand_d)
    patches = patches.at[:, 2].set(
        jnp.broadcast_to(depth, (M, P, P)))

    # --- table writes ---
    patches_buf = jax.lax.dynamic_update_slice(
        patches_buf, patches, (n * M, 0, 0, 0))
    intrinsics_buf = intrinsics_buf.at[n].set(intrinsics)
    colors_buf = colors_buf.at[n].set(clr)

    slot_p = (n % pmem) * M
    imap_buf = jax.lax.dynamic_update_slice(
        imap_buf, imap.astype(imap_buf.dtype), (slot_p, 0))
    gmap_buf = jax.lax.dynamic_update_slice(
        gmap_buf, gmap.astype(gmap_buf.dtype), (slot_p, 0, 0, 0))
    fmap1_buf = fmap1_buf.at[n % mem].set(
        cp.pad_fmap(fmap1[None])[0].astype(fmap1_buf.dtype))
    fmap2_buf = fmap2_buf.at[n % mem].set(
        cp.pad_fmap(fmap2[None])[0].astype(fmap2_buf.dtype))

    return (poses, patches_buf, intrinsics_buf, colors_buf,
            imap_buf, gmap_buf, fmap1_buf, fmap2_buf)


@partial(jax.jit,
         static_argnames=("patchifier", "M", "pmem", "mem",
                          "motion_damping", "fixed_depth"),
         donate_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def track_frame(params, patchifier: Patchifier,
                poses, patches_buf, intrinsics_buf, colors_buf,
                imap_buf, gmap_buf, fmap1_buf, fmap2_buf,
                image, coords, intrinsics, n, fac, is_initialized, rng,
                M, pmem, mem, motion_damping, fixed_depth=None):
    """Fused process_frame + write_frame: one dispatch per tracked frame."""
    fmap1, fmap2, gmap, imap, patches, clr = process_frame(
        params, patchifier, image, coords)
    return write_frame(poses, patches_buf, intrinsics_buf, colors_buf,
                       imap_buf, gmap_buf, fmap1_buf, fmap2_buf,
                       fmap1, fmap2, gmap, imap, patches, clr,
                       intrinsics, n, fac, is_initialized, rng,
                       M=M, pmem=pmem, mem=mem,
                       motion_damping=motion_damping,
                       fixed_depth=fixed_depth)


@partial(jax.jit,
         static_argnames=("patchifier", "M", "pmem", "mem",
                          "motion_damping", "strat"),
         donate_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def track_frame_u8(params, patchifier: Patchifier,
                   poses, patches_buf, intrinsics_buf, colors_buf,
                   imap_buf, gmap_buf, fmap1_buf, fmap2_buf,
                   image_u8, intrinsics, n, fac, is_initialized, rng,
                   M, pmem, mem, motion_damping, strat="RANDOM",
                   step=None):
    """Whole per-frame device pipeline in ONE dispatch: uint8 image
    normalization (ref dpvo.py:389), centroid selection (net.py:115-132),
    Patchifier forward, and all state writes.

    ``rng`` is a base key reused every frame; ``step`` (dynamic int32)
    folds the frame counter in ON DEVICE — the host never dispatches a
    per-frame jax.random.split (each dispatch is an RPC through a
    remote-TPU tunnel)."""
    from ..models.vonet import (image_gradient, normalize_images,
                                select_centroids)
    img = normalize_images(image_u8)
    h, w = img.shape[0] // 4, img.shape[1] // 4
    if step is not None:
        rng = jax.random.fold_in(rng, step)
    k_sel, k_depth = jax.random.split(rng)
    grad = image_gradient(img[None]) if strat == "GRADIENT_BIAS" else None
    coords = select_centroids(k_sel, strat, 1, h, w, M, gradient=grad)[0]
    return track_frame(params, patchifier,
                       poses, patches_buf, intrinsics_buf, colors_buf,
                       imap_buf, gmap_buf, fmap1_buf, fmap2_buf,
                       img, coords, intrinsics, n, fac, is_initialized,
                       k_depth, M=M, pmem=pmem, mem=mem,
                       motion_damping=motion_damping)


# ---------------------------------------------------------------------------
# the hot loop: one optimization update
# ---------------------------------------------------------------------------

def _corr_features(gmap_buf, fmap1_buf, fmap2_buf, coords2, kk_mod,
                   jj_mod):
    """Two-level correlation, flattened (ref dpvo.py:200-207).

    XLA gather path; fmap buffers are stored PAD-padded."""
    c1 = corr_ops.corr(gmap_buf, fmap1_buf, coords2, kk_mod, jj_mod, 3,
                       pad=cp.PAD)
    c2 = corr_ops.corr(gmap_buf, fmap2_buf, coords2 / 4.0, kk_mod, jj_mod,
                       3, pad=cp.PAD)
    E = coords2.shape[0]
    return jnp.stack([c1, c2], axis=-1).reshape(E, -1)


def _corr_features_pallas(gmap_buf, fmap1_buf, fmap2_buf, coords2, kk_mod,
                          corr_perm, corr_inv, tile_frame, n_live=None,
                          enc_kernel=None, pre_sorted=False):
    """Pallas frame-resident correlation over jj-grouped edges.

    corr_perm (Es,) sorts/pads edges into frame-contiguous TILE groups;
    corr_inv (E,) maps table rows back; tile_frame (Es//TILE,) gives the
    fmap ring slot per tile; n_live counts the live tiles (stale rows
    group to the tail and their tiles are skipped in-kernel).

    Both levels run in ONE fused grid pass (corr_pallas_fused) emitting
    the compute dtype in the raw (level, p, dy, dx) layout, and the
    result is handed to CorrDense's raw form: the corr encoder permutes
    its kernel ROWS (matmul-exact) instead of transposing/interleaving
    the feature array — measured 9.7 -> 8.6 ms for the corr block at
    Es=15k (the old ref-layout path paid two bf16 relayout copies plus
    the interleave)."""
    C = gmap_buf.shape[-1]
    Es = corr_perm.shape[0]
    if pre_sorted:
        # caller computed coords directly in corr-sorted order
        coords_s = coords2                               # (Es, 2, P, P)
        kk_s = kk_mod[corr_perm]
    else:
        coords_s = coords2[corr_perm]                    # (Es, 2, P, P)
        kk_s = kk_mod[corr_perm]
    dt = gmap_buf.dtype
    if cp.FUSED_VERSION == 13 and enc_kernel is not None:
        # fused gather + correlation + corr-encoder matmul: the whole
        # gmap ring rides VMEM-resident, no (Es, 9, C) g_pre gather and
        # no (Es, 2304) feature tensor in HBM (see _kernel_fused_v13)
        K = gmap_buf.shape[0]
        g_all = gmap_buf.reshape(K, cp.P2, C)
        w_enc = cp.map_enc_kernel(enc_kernel).astype(dt)
        out = cp.corr_pallas_enc(g_all, kk_s, w_enc, fmap1_buf,
                                 fmap2_buf, coords_s, tile_frame,
                                 n_live=n_live, out_dtype=dt)
        return ("enc", out, corr_inv)
    g_pre = gmap_buf[kk_s].reshape(Es, cp.P2, C)
    out = cp.corr_pallas_fused(g_pre, fmap1_buf, fmap2_buf, coords_s,
                               tile_frame, n_live=n_live, out_dtype=dt)
    return ("raw", out.reshape(Es, -1), corr_inv)


def _update_core(params, poses, patches_buf, intrinsics_buf,
                 imap_buf, gmap_buf, fmap1_buf, fmap2_buf,
                 net_tab, target_tab, weight_tab, ii, jj, kk, valid,
                 t0, t1, update_mod: Update, M, pmem, mem, n_cap, k_cap,
                 iterations, run_ba, use_pallas,
                 corr_perm, corr_inv, tile_frame, agg_meta, nbrs, mm,
                 n_live=None, compact_meta=None, g_cap=None,
                 ba_perm=None):
    """Shared body of update_step/update_step_dev (traced inside jit)."""
    E = ii.shape[0]  # the bucket size
    P = patches_buf.shape[-1]
    c = P // 2
    net = jax.lax.dynamic_slice(net_tab, (0, 0), (E, net_tab.shape[1]))

    # reproject all patch pixels (ref dpvo.py:209-213)
    ii_s = jnp.where(valid, ii, 0)
    jj_s = jnp.where(valid, jj, 0)
    kk_s = jnp.where(valid, kk, 0)
    Gij_e = Gij_tab = gid_o_ij = pair_rep = None
    if compact_meta is not None:
        # relative poses per frame PAIR (~300 at the retain bucket)
        # instead of per edge: the agg_ij metadata already ranks the
        # pairs densely; gid_s_ij is SORTED, so each group's first
        # member is its searchsorted position (512 binary-search
        # queries beat a 45k-update scatter-min on TPU) and one gather
        # broadcasts the table back
        perm_ij, gid_s_ij, gid_o_ij = compact_meta[1]
        E_b = ii.shape[0]
        first = jnp.minimum(
            jnp.searchsorted(gid_s_ij,
                             jnp.arange(g_cap, dtype=gid_s_ij.dtype)
                             ).astype(jnp.int32),
            E_b - 1)
        pair_rep = perm_ij[first]
        Gij_tab = lie.se3_mul(poses[jj_s[pair_rep]],
                              lie.se3_inv(poses[ii_s[pair_rep]]))
        Gij_e = Gij_tab[gid_o_ij]

    kk_mod = kk_s % (M * pmem)
    jj_mod = jj_s % mem
    if use_pallas:
        # reproject DIRECTLY in corr-sorted order: permuting the (E,)
        # index vectors costs ~nothing, while permuting the computed
        # (E, 2, P, P) coords was a 2.3 ms random gather at the retain
        # bucket (corr_block_profile.py); BA's center coords come back
        # through the cheap (E, 2) inverse gather
        ii_p = ii_s[corr_perm]
        jj_p = jj_s[corr_perm]
        kk_p = kk_s[corr_perm]
        Gij_p = None if Gij_tab is None else Gij_tab[gid_o_ij[corr_perm]]
        coords_p = pops.transform(poses, patches_buf, intrinsics_buf,
                                  ii_p, jj_p, kk_p, Gij=Gij_p)
        coords2_s = coords_p.transpose(0, 3, 1, 2)     # (Es, 2, P, P)
        coords_ctr = coords_p[:, c, c][corr_inv]       # (E, 2)
        enc_kernel = None
        if cp.FUSED_VERSION == 13:
            enc_kernel = params["params"]["corr1"]["kernel"]
        corr_feat = _corr_features_pallas(
            gmap_buf, fmap1_buf, fmap2_buf, coords2_s, kk_mod,
            corr_perm, corr_inv, tile_frame, n_live=n_live,
            enc_kernel=enc_kernel, pre_sorted=True)
    else:
        # two-level correlation (ref dpvo.py:200-207)
        coords = pops.transform(poses, patches_buf, intrinsics_buf,
                                ii_s, jj_s, kk_s, Gij=Gij_e)
        coords2 = coords.transpose(0, 3, 1, 2)         # (E, 2, P, P)
        coords_ctr = coords[:, c, c]                   # (E, 2)
        corr_feat = _corr_features(gmap_buf, fmap1_buf, fmap2_buf,
                                   coords2, kk_mod, jj_mod)

    ctx = imap_buf[kk_mod].astype(jnp.float32)
    net, delta, weight = update_mod.apply(
        params, net, ctx, corr_feat, ii_s, jj_s, kk_s, valid,
        agg_meta=agg_meta, nbrs=nbrs, compact_meta=compact_meta,
        g_cap=g_cap)

    target = coords_ctr + delta                        # (E, 2)
    target = jnp.where(valid[:, None], target, 0.0)

    if run_ba:
        poses, patches_buf = ba.ba_iterative(
            poses, patches_buf, intrinsics_buf[0], target, weight,
            jnp.float32(1e-4), ii_s, jj_s, kk_s, valid, t0, t1,
            n_cap=n_cap, k_cap=k_cap, iterations=iterations,
            eperm=ba_perm,
            pair_gid=None if compact_meta is None else compact_meta[1][2],
            pair_cap=None if compact_meta is None else g_cap,
            pair_rep=pair_rep)

    net_tab = jax.lax.dynamic_update_slice(
        net_tab, net.astype(net_tab.dtype), (0, 0))
    target_tab = jax.lax.dynamic_update_slice(
        target_tab, target.astype(target_tab.dtype), (0, 0))
    weight_tab = jax.lax.dynamic_update_slice(
        weight_tab, weight.astype(weight_tab.dtype), (0, 0))

    # keyframe motionmag folded into the same program (post-BA poses,
    # ref dpvo.py:268): one dispatch per frame instead of two
    mag = None
    if mm is not None:
        mag = flowmag_two(poses, patches_buf, intrinsics_buf,
                          mm[0], mm[1], mm[2], mm[3],
                          mm[4], mm[5], mm[6], mm[7])
    return net_tab, target_tab, weight_tab, delta, poses, patches_buf, mag


@partial(jax.jit,
         static_argnames=("update_mod", "M", "pmem", "mem", "n_cap",
                          "k_cap", "iterations", "run_ba", "use_pallas"),
         donate_argnums=(1, 2, 8, 9, 10))
def update_step(params, poses, patches_buf, intrinsics_buf,
                imap_buf, gmap_buf, fmap1_buf, fmap2_buf,
                net_tab, target_tab, weight_tab, ii, jj, kk, valid, t0, t1,
                update_mod: Update, M, pmem, mem, n_cap, k_cap,
                iterations=2, run_ba=True, use_pallas=False,
                corr_perm=None, corr_inv=None, tile_frame=None,
                agg_meta=None, nbrs=None, mm=None, n_live=None):
    """Reproject -> correlate -> recurrent update -> bundle adjust
    (ref dpvo.py:328-356) with HOST-provided edge arrays + metadata.

    Edge arrays (ii/jj/kk/valid and the corr/agg metadata) arrive sliced
    to a power-of-two bucket of the live edge count; the full-capacity
    net/target/weight tables are sliced to the bucket in here and written
    back in place (donated), so the per-update compute scales with the
    live edge count instead of EDGE_CAPACITY.
    Returns (net_tab', target_tab', weight_tab', delta, poses',
    patches_buf', mag).
    """
    return _update_core(params, poses, patches_buf, intrinsics_buf,
                        imap_buf, gmap_buf, fmap1_buf, fmap2_buf,
                        net_tab, target_tab, weight_tab, ii, jj, kk,
                        valid, t0, t1, update_mod, M, pmem, mem, n_cap,
                        k_cap, iterations, run_ba, use_pallas,
                        corr_perm, corr_inv, tile_frame, agg_meta, nbrs,
                        mm, n_live=n_live)


@partial(jax.jit,
         static_argnames=("update_mod", "M", "pmem", "mem", "n_cap",
                          "k_cap", "iterations", "run_ba", "use_pallas",
                          "bucket", "has_mm"),
         donate_argnums=(1, 2, 8, 9, 10))
def update_step_dev(params, poses, patches_buf, intrinsics_buf,
                    imap_buf, gmap_buf, fmap1_buf, fmap2_buf,
                    net_tab, target_tab, weight_tab,
                    eii_tab, ejj_tab, ekk_tab, e_num, t0, t1, mm_blob,
                    update_mod: Update, M, pmem, mem, n_cap, k_cap,
                    bucket, iterations=2, run_ba=True, use_pallas=False,
                    has_mm=False):
    """update_step with DEVICE-resident edge index tables and ALL edge
    metadata (group sorts, temporal neighbors, Pallas corr grouping)
    computed in-program.

    The host uploads nothing per update except the tiny keyframe
    motionmag blob — a 12k-edge argsort costs ~40us on TPU while the
    host metadata path costs three thread sorts + a ~1MB upload RPC
    (~15ms through a remote-TPU tunnel).
    ``eii/ejj/ekk`` are full-capacity int32 tables maintained by
    ``append_edges``/``permute_edges_b``/``shift_edge_indices``; rows
    >= e_num are stale and masked by ``valid``.
    """
    from ..ops import graph
    from ..ops.scatter import group_meta_device, group_meta_compact_device
    from ..ops.corr_pallas import corr_grouping_device

    ii = jax.lax.dynamic_slice(eii_tab, (0,), (bucket,))
    jj = jax.lax.dynamic_slice(ejj_tab, (0,), (bucket,))
    kk = jax.lax.dynamic_slice(ekk_tab, (0,), (bucket,))
    valid = jnp.arange(bucket, dtype=jnp.int32) < e_num

    agg_meta = compact_meta = g_cap = ba_perm = None
    if use_pallas:
        # TPU fast path: ONE (kk, jj) lexsort feeds the temporal
        # neighbors, the agg_kk compact metadata AND the BA edge sort
        # (they all key on valid-masked kk; tie order is free), and the
        # SoftAggs run compact via ops.agg_pallas — measured 2.5 ms of
        # per-update sort metadata down to ~1 ms at the 45k bucket.
        kk_g = jnp.where(valid, kk, jnp.iinfo(jnp.int32).max)
        pair = jnp.where(valid, ii * jnp.int32(12345) + jj,
                         jnp.iinfo(jnp.int32).max)
        order = jnp.lexsort((jj, kk_g)).astype(jnp.int32)
        nbrs = graph.neighbors_from_order(kk_g, valid, order)
        cm_kk = group_meta_compact_device(kk_g, order=order)
        cm_ij = group_meta_compact_device(pair)
        compact_meta = (cm_kk, cm_ij)
        g_cap = k_cap + 8
        ba_perm = order
    else:
        kk_g = jnp.where(valid, kk, -1)
        pair = jnp.where(valid, ii * jnp.int32(12345) + jj, -1)
        agg_meta = (group_meta_device(kk_g), group_meta_device(pair))
        nbrs = graph.neighbors(kk, jj, valid)

    corr_perm = corr_inv = tile_frame = n_live = None
    if use_pallas:
        corr_perm, corr_inv, tile_frame, n_live = corr_grouping_device(
            jj, mem, valid)

    mm = None
    if has_mm:
        mm = split_blob(mm_blob, (mm_blob.shape[0] // 8,) * 8,
                        bools=(3, 7))

    return _update_core(params, poses, patches_buf, intrinsics_buf,
                        imap_buf, gmap_buf, fmap1_buf, fmap2_buf,
                        net_tab, target_tab, weight_tab, ii, jj, kk,
                        valid, t0, t1, update_mod, M, pmem, mem, n_cap,
                        k_cap, iterations, run_ba, use_pallas,
                        corr_perm, corr_inv, tile_frame, agg_meta, nbrs,
                        mm, n_live=n_live, compact_meta=compact_meta,
                        g_cap=g_cap, ba_perm=ba_perm)


@partial(jax.jit, static_argnames=("update_mod", "M", "pmem", "mem"))
def motion_probe(params, poses, patches_buf, intrinsics_buf,
                 imap_buf, gmap_buf, fmap1_buf, fmap2_buf,
                 ii, jj, kk, update_mod: Update, M, pmem, mem):
    """Median flow delta for the init motion check (ref dpvo.py:240-255)."""
    E = ii.shape[0]
    valid = jnp.ones((E,), bool)
    net = jnp.zeros((E, DIM), jnp.float32)

    coords = pops.transform(poses, patches_buf, intrinsics_buf, ii, jj, kk)
    coords2 = coords.transpose(0, 3, 1, 2)
    kk_mod = kk % (M * pmem)
    corr_feat = _corr_features(gmap_buf, fmap1_buf, fmap2_buf, coords2,
                               kk_mod, jj % mem)
    ctx = imap_buf[kk_mod].astype(jnp.float32)
    _, delta, _ = update_mod.apply(params, net, ctx, corr_feat,
                                   ii, jj, kk, valid)
    return jnp.quantile(jnp.linalg.norm(delta, axis=-1), 0.5)


# ---------------------------------------------------------------------------
# keyframing
# ---------------------------------------------------------------------------

@jax.jit
def flowmag_pair(poses, patches_buf, intrinsics_buf, ii, jj, kk, valid):
    """Mean flow magnitude over masked edges (ref dpvo.py:257-264,
    flow_mag with beta=0.5)."""
    ii_s = jnp.where(valid, ii, 0)
    jj_s = jnp.where(valid, jj, 0)
    kk_s = jnp.where(valid, kk, 0)
    flow, _ = pops.flow_mag(poses, patches_buf, intrinsics_buf,
                            ii_s, jj_s, kk_s, beta=0.5)
    m = valid[:, None, None].astype(jnp.float32)
    cnt = jnp.maximum(m.sum() * flow.shape[1] * flow.shape[2], 1.0)
    return jnp.sum(flow * m) / cnt


@jax.jit
def flowmag_two(poses, patches_buf, intrinsics_buf,
                ii_a, jj_a, kk_a, valid_a,
                ii_b, jj_b, kk_b, valid_b):
    """Both keyframe motionmag directions in ONE dispatch so the host
    pays a single device sync per frame (ref dpvo.py:268 computes
    motionmag(i, j) + motionmag(j, i) as two calls)."""
    ma = flowmag_pair(poses, patches_buf, intrinsics_buf,
                      ii_a, jj_a, kk_a, valid_a)
    mb = flowmag_pair(poses, patches_buf, intrinsics_buf,
                      ii_b, jj_b, kk_b, valid_b)
    return ma + mb


@partial(jax.jit, static_argnames=("M", "pmem", "mem", "shift_cap"),
         donate_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def compact_frames(poses, patches_buf, intrinsics_buf, colors_buf,
                   imap_buf, gmap_buf, fmap1_buf, fmap2_buf,
                   k, n, M, pmem, mem, shift_cap):
    """Remove keyframe slot ``k``: shift frames (k, n] down by one
    (ref dpvo.py:287-297).  shift_cap bounds the ring-buffer shift length
    (KEYFRAME_INDEX + 2 in practice)."""
    N = poses.shape[0]
    P = patches_buf.shape[-1]
    idx = jnp.arange(N)
    src = jnp.where(idx >= k, jnp.minimum(idx + 1, N - 1), idx)

    poses = poses[src]
    intrinsics_buf = intrinsics_buf[src]
    colors_buf = colors_buf[src]
    patches_buf = patches_buf.reshape(N, M, 3, P, P)[src].reshape(
        N * M, 3, P, P)

    # ring buffers: slots i%pmem <- (i+1)%pmem for i in [k, n-1)
    offs = jnp.arange(shift_cap)
    i_vals = k + offs
    do = i_vals < n - 1
    ring_src_p = jnp.arange(pmem)
    ring_src_p = ring_src_p.at[jnp.where(do, i_vals % pmem, pmem)].set(
        jnp.where(do, (i_vals + 1) % pmem, 0), mode="drop")
    ring_src_m = jnp.arange(mem)
    ring_src_m = ring_src_m.at[jnp.where(do, i_vals % mem, mem)].set(
        jnp.where(do, (i_vals + 1) % mem, 0), mode="drop")

    imap_buf = imap_buf.reshape(pmem, M, -1)[ring_src_p].reshape(
        pmem * M, -1)
    gmap_buf = gmap_buf.reshape(pmem, M, P, P, -1)[ring_src_p].reshape(
        pmem * M, P, P, -1)

    # fmap1 is ~220MB at 480p with mem=36: a full-table gather costs
    # ~1.2 ms, while only <= shift_cap slots actually move.  Shift them
    # with dynamic slice copies in ascending order (each slot is read
    # before it is overwritten).
    def shift_ring(buf):
        tail = (0,) * (buf.ndim - 1)
        row_shape = (1,) + buf.shape[1:]
        msz = buf.shape[0]

        def body(o, b):
            i = k + o
            src = (i + 1) % msz
            dst = i % msz
            row = jax.lax.dynamic_slice(b, (src,) + tail, row_shape)
            keep = jax.lax.dynamic_slice(b, (dst,) + tail, row_shape)
            row = jnp.where(i < n - 1, row, keep)
            return jax.lax.dynamic_update_slice(b, row, (dst,) + tail)

        return jax.lax.fori_loop(0, shift_cap, body, buf)

    fmap1_buf = shift_ring(fmap1_buf)
    fmap2_buf = fmap2_buf[ring_src_m]

    return (poses, patches_buf, intrinsics_buf, colors_buf,
            imap_buf, gmap_buf, fmap1_buf, fmap2_buf)


@partial(jax.jit, static_argnames=("M", "chunk"),
         donate_argnums=(0, 1, 2, 3))
def append_edges(eii, ejj, ekk, net_tab, new_blob, s, M, chunk):
    """Append ``chunk`` edge rows at ``s``: write kk/jj (packed in
    new_blob, pad rows carry garbage that later appends overwrite),
    derive ii = kk // M, and zero the new rows' hidden state
    (ref dpvo.py:215-221).  One dispatch, ~2*chunk ints uploaded."""
    kk_new = jax.lax.dynamic_slice(new_blob, (0,), (chunk,))
    jj_new = jax.lax.dynamic_slice(new_blob, (chunk,), (chunk,))
    ekk = jax.lax.dynamic_update_slice(ekk, kk_new, (s,))
    ejj = jax.lax.dynamic_update_slice(ejj, jj_new, (s,))
    eii = jax.lax.dynamic_update_slice(eii, kk_new // M, (s,))
    net_tab = jax.lax.dynamic_update_slice(
        net_tab, jnp.zeros((chunk, net_tab.shape[1]), net_tab.dtype),
        (s, 0))
    return eii, ejj, ekk, net_tab


@partial(jax.jit, static_argnames=("bucket",),
         donate_argnums=(0, 1, 2, 3, 4, 5))
def permute_edges_b(net, target, weight, eii, ejj, ekk, perm, zero_from,
                    bucket):
    """Bucketed edge-table compaction: only the first ``bucket`` rows
    (a power-of-two cover of the live count) are gathered — the old
    full-capacity permute cost ~7.5ms/frame on a 57k-row table when
    <16k rows were live.  Rows >= zero_from are cleared within the
    bucket (fresh edges start from zero state, ref dpvo.py:220-221)."""
    D = net.shape[1]
    net_b = jax.lax.dynamic_slice(net, (0, 0), (bucket, D))[perm]
    tgt_b = jax.lax.dynamic_slice(target, (0, 0), (bucket, 2))[perm]
    wgt_b = jax.lax.dynamic_slice(weight, (0, 0), (bucket, 2))[perm]
    ii_b = jax.lax.dynamic_slice(eii, (0,), (bucket,))[perm]
    jj_b = jax.lax.dynamic_slice(ejj, (0,), (bucket,))[perm]
    kk_b = jax.lax.dynamic_slice(ekk, (0,), (bucket,))[perm]
    row = jnp.arange(bucket)[:, None]
    net_b = jnp.where(row >= zero_from, 0.0, net_b)
    tgt_b = jnp.where(row >= zero_from, 0.0, tgt_b)
    wgt_b = jnp.where(row >= zero_from, 0.0, wgt_b)
    return (jax.lax.dynamic_update_slice(net, net_b, (0, 0)),
            jax.lax.dynamic_update_slice(target, tgt_b, (0, 0)),
            jax.lax.dynamic_update_slice(weight, wgt_b, (0, 0)),
            jax.lax.dynamic_update_slice(eii, ii_b, (0,)),
            jax.lax.dynamic_update_slice(ejj, jj_b, (0,)),
            jax.lax.dynamic_update_slice(ekk, kk_b, (0,)))


@partial(jax.jit, static_argnames=("M",), donate_argnums=(0, 1, 2))
def shift_edge_indices(eii, ejj, ekk, k, M):
    """Keyframe-merge index shift on the device edge tables
    (ref dpvo.py:283-285): frames above the removed slot k move down."""
    mi = eii > k
    ekk = jnp.where(mi, ekk - M, ekk)
    eii = jnp.where(mi, eii - 1, eii)
    ejj = jnp.where(ejj > k, ejj - 1, ejj)
    return eii, ejj, ekk


@partial(jax.jit, donate_argnums=(0, 1, 2))
def permute_edges(net, target, weight, perm, zero_from):
    """Compact edge rows by a host-computed permutation; rows at index >=
    zero_from are cleared (freshly appended edges start with zero state,
    ref dpvo.py:220-221)."""
    net = net[perm]
    target = target[perm]
    weight = weight[perm]
    row = jnp.arange(net.shape[0])[:, None]
    net = jnp.where(row >= zero_from, 0.0, net)
    target = jnp.where(row >= zero_from, 0.0, target)
    weight = jnp.where(row >= zero_from, 0.0, weight)
    return net, target, weight


@jax.jit
def point_cloud(poses, patches_buf, intrinsics_buf, ix):
    """World points at patch centers for viz/export (ref dpvo.py:358-360)."""
    pts = pops.point_cloud(poses, patches_buf, intrinsics_buf, ix)
    c = patches_buf.shape[-1] // 2
    ctr = pts[:, c, c]
    return ctr[:, :3] / jnp.maximum(ctr[:, 3:], 1e-8)


@partial(jax.jit, static_argnames=("M",), donate_argnums=(0, 1))
def normalize_scene(poses, patches_buf, n, M):
    """Depth/pose rescale before global BA (ref patchgraph.py:84-91).

    s = mean inverse depth over live patches; depths /= s, translations
    *= s, and poses are re-anchored to the first frame.  The guard
    (finite, > 0) is a where() so no host sync is needed.
    Returns (poses', patches', s) with s a device scalar for rescaling
    the host's delta chain.
    """
    K = patches_buf.shape[0]
    live = jnp.arange(K) < n * M
    d = patches_buf[:, 2]
    s_raw = jnp.sum(jnp.where(live[:, None, None], d, 0.0)) \
        / jnp.maximum(n * M * d.shape[1] * d.shape[2], 1)
    ok = jnp.isfinite(s_raw) & (s_raw > 0)
    s = jnp.where(ok, s_raw, 1.0)

    patches_buf = jnp.where(
        live[:, None, None, None],
        patches_buf.at[:, 2].divide(s), patches_buf)

    N = poses.shape[0]
    live_p = jnp.arange(N) < n
    poses_s = poses.at[:, :3].multiply(s)
    first_inv = lie.se3_inv(poses_s[0])
    re_anchored = lie.se3_mul(poses_s, first_inv[None])
    poses = jnp.where(live_p[:, None], re_anchored, poses)
    return poses, patches_buf, s


@jax.jit
def relative_pose(poses, k):
    """dP = poses[k] * poses[k-1]^-1 with dynamic k (one cached program
    for the keyframe-merge delta, ref dpvo.py:277)."""
    k = jnp.asarray(k, jnp.int32)
    return lie.se3_mul(poses[k], lie.se3_inv(poses[jnp.maximum(k - 1, 0)]))


@partial(jax.jit, static_argnames=("sizes", "bools"))
def split_blob(blob, sizes, bools=()):
    """Split one packed int32 upload into per-array device slices.

    Through a remote-TPU tunnel each host->device transfer is a separate
    RPC; packing the ~20 per-update metadata arrays into one blob makes
    the update's host cost one upload + one dispatch.  ``bools`` lists
    indices to cast to bool.
    """
    outs = []
    off = 0
    for i, s in enumerate(sizes):
        a = jax.lax.dynamic_slice(blob, (off,), (s,))
        if i in bools:
            a = a.astype(bool)
        outs.append(a)
        off += s
    return tuple(outs)


@jax.jit
def zero_rows(net, s, cnt):
    """Zero rows [s, s+cnt) of the edge hidden-state table (fresh edges
    start from zero, ref dpvo.py:220-221); dynamic bounds, one program."""
    row = jnp.arange(net.shape[0])[:, None]
    return jnp.where((row >= s) & (row < s + cnt), 0.0, net)


@partial(jax.jit, static_argnames=("cap",))
def flowmag_two_blob(poses, patches_buf, intrinsics_buf, blob, cap):
    """flowmag_two with both directions' (ii, jj, kk, valid) packed into
    one (8*cap,) int32 upload."""
    p = split_blob(blob, (cap,) * 8, bools=(3, 7))
    return flowmag_two(poses, patches_buf, intrinsics_buf,
                       p[0], p[1], p[2], p[3], p[4], p[5], p[6], p[7])



@partial(jax.jit, static_argnames=("chunk",), donate_argnums=(2, 3))
def store_inactive(target_tab, weight_tab, t_inac, w_inac, idx, dest,
                   chunk):
    """Copy retired edges' target/weight rows into the device-side
    inactive store (ref dpvo.py:228-236 keeps them for global BA).
    ``idx`` (chunk,) gathers rows (pad entries may write garbage past
    the live region; the next append overwrites it)."""
    t_inac = jax.lax.dynamic_update_slice(t_inac, target_tab[idx],
                                          (dest, 0))
    w_inac = jax.lax.dynamic_update_slice(w_inac, weight_tab[idx],
                                          (dest, 0))
    return t_inac, w_inac


@partial(jax.jit, static_argnames=("cap",))
def concat_edge_tw(t_inac, w_inac, target_tab, weight_tab, n_inac, e,
                   cap):
    """Inactive + active target/weight rows concatenated on device (no
    host round-trip) and zero-padded to the static global-BA bucket."""
    i = jnp.arange(cap)
    from_inac = i < n_inac
    live = i < (n_inac + e)
    idx_i = jnp.clip(i, 0, t_inac.shape[0] - 1)
    idx_a = jnp.clip(i - n_inac, 0, target_tab.shape[0] - 1)
    t = jnp.where(from_inac[:, None], t_inac[idx_i], target_tab[idx_a])
    w = jnp.where(from_inac[:, None], w_inac[idx_i], weight_tab[idx_a])
    return (jnp.where(live[:, None], t, 0.0),
            jnp.where(live[:, None], w, 0.0))
