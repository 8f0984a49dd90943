"""Steady-state per-frame program costs at the bench operating point.

Measures, in-jit (microbench chain harness: survives the ~30ms sync
floor, memoization, and constant folding of the axon tunnel), every
device program the merge-every-frame regime dispatches per frame:

    track_frame_u8, append_edges, update_step_dev (full hot loop),
    relative_pose, shift_edge_indices, compact_frames, permute_edges_b

Usage: python scripts/dev/frame_profile.py [bucket] [live] [window]

Defaults model the merge-every-frame regime (13.8k live edges, 13-frame
window).  The retain regime (no merges, KEYFRAME_THRESH=0) carries
~45k live edges over REMOVAL_WINDOW=22 patch frames:

    python scripts/dev/frame_profile.py 45056 44640 22
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp

import os
_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(_HERE)))
sys.path.insert(0, _HERE)
from microbench import timed

from dpvo_tpu.config import VOConfig
from dpvo_tpu.engine import kernels
from dpvo_tpu.models.update import Update, DIM
from dpvo_tpu.models.vonet import Patchifier
from dpvo_tpu.ops import corr_pallas as cp

bucket = int(sys.argv[1]) if len(sys.argv) > 1 else 16384

cfg = VOConfig(BUFFER_SIZE=256, MIXED_PRECISION=True, LOOP_CLOSURE=False,
               EDGE_CAPACITY=57344)
ht, wd = 480, 640
M, P = cfg.PATCHES_PER_FRAME, 3
mem = pmem = 36
N = cfg.BUFFER_SIZE
E_cap = cfg.edge_capacity()
h, w = ht // 4, wd // 4
n_cap, k_cap = 16, 4096
dt = jnp.bfloat16

rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)

patchifier = Patchifier(P, dtype=dt)
update_mod = Update(P, dtype=dt)

img = jnp.zeros((1, 64, 64, 3))
crd = jnp.zeros((1, 4, 2))
p_params = patchifier.init(key, img, crd)
u_params = update_mod.init(
    key, jnp.zeros((8, DIM)), jnp.zeros((8, DIM)),
    jnp.zeros((8, 2 * 49 * P * P)), jnp.zeros((8,), jnp.int32),
    jnp.zeros((8,), jnp.int32), jnp.zeros((8,), jnp.int32))

poses = jnp.zeros((N, 7)).at[:, 6].set(1.0)
patches = jnp.asarray(rng.uniform(1, 4, (N * M, 3, P, P)), jnp.float32)
intrinsics = jnp.tile(jnp.asarray([[160., 160., 80., 60.]]), (N, 1))
colors = jnp.zeros((N, M, 3), jnp.uint8)
imap = jnp.asarray(rng.normal(size=(pmem * M, DIM)), dt)
gmap = jnp.asarray(rng.normal(size=(pmem * M, P, P, 128)), dt)
fmap1 = jnp.asarray(rng.normal(size=(mem, *cp.padded_hw(h, w), 128)), dt)
fmap2 = jnp.asarray(
    rng.normal(size=(mem, *cp.padded_hw(h // 4, w // 4), 128)), dt)
net_tab = jnp.zeros((E_cap, DIM), jnp.float32)
target_tab = jnp.zeros((E_cap, 2), jnp.float32)
weight_tab = jnp.zeros((E_cap, 2), jnp.float32)

# realistic steady-state edge table: 13.8k live edges over a ~13-frame
# window ending at frame n=24 (override: argv live / window)
live = int(sys.argv[2]) if len(sys.argv) > 2 else 13824
window = int(sys.argv[3]) if len(sys.argv) > 3 else 12
n_now = window * 2
kk_np = rng.integers((n_now - window) * M, n_now * M, E_cap).astype(
    np.int32)
kk_np.sort()
ii_np = kk_np // M
jj_np = np.minimum(ii_np + rng.integers(1, 12, E_cap), n_now).astype(
    np.int32)
eii = jnp.asarray(ii_np)
ejj = jnp.asarray(jj_np)
ekk = jnp.asarray(kk_np)
e_num = jnp.int32(live)

mm_blob = jnp.zeros((8 * 256,), jnp.int32)

kw = dict(update_mod=update_mod, M=M, pmem=pmem, mem=mem, n_cap=n_cap,
          k_cap=k_cap, bucket=bucket, iterations=2, run_ba=True,
          use_pallas=True, has_mm=True)


BIG_ARGS = (poses, patches, intrinsics, imap, gmap, fmap1, fmap2,
            net_tab, target_tab, weight_tab, eii, ejj, ekk, mm_blob)


def live_sum(out):
    """Reduce every output leaf to one scalar so the chain keeps ALL of
    them live (the harness threads only leaf[0] through its accumulator;
    returning the tuple would let XLA DCE e.g. the whole BA)."""
    tot = jnp.float32(0)
    for x in jax.tree.leaves(out):
        if x is None or isinstance(x, str):
            continue
        tot = tot + jnp.sum(x.astype(jnp.float32))
    return jnp.clip(tot, -1e6, 1e6)[None]


def upd_with(kwv, name):
    # all large arrays passed as jit ARGS (closure constants would be
    # serialized into the remote-compile request body: HTTP 413)
    def f(e_num, poses, patches, intrinsics, imap, gmap, fmap1, fmap2,
          net_tab, target_tab, weight_tab, eii, ejj, ekk, mm_blob):
        return live_sum(kernels.update_step_dev(
            u_params, poses, patches, intrinsics, imap, gmap, fmap1,
            fmap2, net_tab, target_tab, weight_tab, eii, ejj, ekk,
            e_num, jnp.int32(n_now - 10), jnp.int32(n_now), mm_blob,
            **kwv))
    timed(name, f, e_num, *BIG_ARGS, reps=8)


upd_with(kw, f"update_step_dev bucket={bucket}")
upd_with(dict(kw, run_ba=False), f"  run_ba=False bucket={bucket}")
upd_with(dict(kw, use_pallas=False), f"  use_pallas=False bucket={bucket}")

# --- track_frame_u8 ------------------------------------------------------
image_u8 = jnp.asarray(rng.integers(0, 255, (ht, wd, 3)), jnp.uint8)


def track(params, poses, patches, step):
    return kernels.track_frame_u8(
        params, patchifier, poses, patches, intrinsics, colors,
        imap, gmap, fmap1, fmap2, image_u8,
        jnp.asarray([160., 160., 80., 60.], jnp.float32),
        jnp.int32(n_now), jnp.float32(1.0), jnp.bool_(True), key,
        M=M, pmem=pmem, mem=mem, motion_damping=0.5, strat="RANDOM",
        step=step)


def track_f(s, poses, patches, intrinsics, imap, gmap, fmap1, fmap2):
    return live_sum(kernels.track_frame_u8(
        p_params, patchifier, poses, patches, intrinsics, colors,
        imap, gmap, fmap1, fmap2, image_u8,
        jnp.asarray([160., 160., 80., 60.], jnp.float32),
        jnp.int32(n_now), jnp.float32(1.0), jnp.bool_(True), key,
        M=M, pmem=pmem, mem=mem, motion_damping=0.5, strat="RANDOM",
        step=s))


timed("track_frame_u8", track_f, jnp.int32(100), poses, patches,
      intrinsics, imap, gmap, fmap1, fmap2, reps=8)

# --- keyframe-merge kernels ---------------------------------------------
timed("relative_pose",
      lambda k, poses: kernels.relative_pose(poses, k),
      jnp.int32(20), poses, reps=8)
timed("shift_edge_indices",
      lambda k, eii, ejj, ekk:
      kernels.shift_edge_indices(eii, ejj, ekk, k, M=M),
      jnp.int32(20), eii, ejj, ekk, reps=8)
timed("compact_frames",
      lambda k, poses, patches, intrinsics, imap, gmap, fmap1, fmap2:
      live_sum(kernels.compact_frames(
          poses, patches, intrinsics, colors, imap, gmap, fmap1, fmap2,
          k, jnp.int32(n_now), M=M, pmem=pmem, mem=mem, shift_cap=7)),
      jnp.int32(20), poses, patches, intrinsics, imap, gmap, fmap1,
      fmap2, reps=8)

perm = jnp.asarray(np.random.permutation(bucket).astype(np.int32))
timed(f"permute_edges_b bucket={bucket}",
      lambda z, net_tab, target_tab, weight_tab, eii, ejj, ekk:
      live_sum(kernels.permute_edges_b(
          net_tab, target_tab, weight_tab, eii, ejj, ekk, perm, z,
          bucket=bucket)),
      jnp.int32(live), net_tab, target_tab, weight_tab, eii, ejj, ekk,
      reps=8)

blob = jnp.zeros((2 * 2048,), jnp.int32)
timed("append_edges chunk=2048",
      lambda s, eii, ejj, ekk, net_tab:
      live_sum(kernels.append_edges(eii, ejj, ekk, net_tab, blob, s,
                           M=M, chunk=2048)),
      jnp.int32(live), eii, ejj, ekk, net_tab, reps=8)


# --- isolated BA + corr at the steady-state bucket -----------------------
from dpvo_tpu.ops import ba as ba_ops

target = jnp.asarray(rng.uniform(0, 150, (bucket, 2)), jnp.float32)
weightb = jnp.asarray(rng.uniform(0, 1, (bucket, 2)), jnp.float32)


def ba_f(e_num, poses, patches, eii, ejj, ekk):
    valid = jnp.arange(bucket, dtype=jnp.int32) < e_num
    out = ba_ops.ba_iterative(
        poses, patches, jnp.asarray([160., 160., 80., 60.]),
        target, weightb, jnp.float32(1e-4),
        eii[:bucket], ejj[:bucket], ekk[:bucket], valid,
        jnp.int32(n_now - 10), jnp.int32(n_now),
        n_cap=n_cap, k_cap=k_cap, iterations=2)
    return live_sum(out)


timed(f"ba_iterative 2it bucket={bucket}", ba_f, e_num, poses, patches,
      eii, ejj, ekk, reps=8)


def corr_f(e_num, poses, patches, gmap, fmap1, fmap2, eii, ejj, ekk):
    from dpvo_tpu.ops import projective as pops
    from dpvo_tpu.ops.corr_pallas import corr_grouping_device
    from dpvo_tpu.engine.kernels import _corr_features_pallas
    ii = eii[:bucket]
    jj = ejj[:bucket]
    kk = ekk[:bucket]
    valid = jnp.arange(bucket, dtype=jnp.int32) < e_num
    ii_s = jnp.where(valid, ii, 0)
    jj_s = jnp.where(valid, jj, 0)
    kk_s = jnp.where(valid, kk, 0)
    coords = pops.transform(poses, patches,
                            jnp.tile(jnp.asarray(
                                [[160., 160., 80., 60.]]), (N, 1)),
                            ii_s, jj_s, kk_s)
    coords2 = coords.transpose(0, 3, 1, 2)
    perm, inv, tf, n_live = corr_grouping_device(jj_s, mem, valid)
    feat = _corr_features_pallas(gmap, fmap1, fmap2, coords2,
                                 kk_s % (M * pmem), perm, inv, tf,
                                 n_live=n_live)
    return live_sum(feat)


timed(f"reproject+corr2lvl bucket={bucket}", corr_f, e_num, poses,
      patches, gmap, fmap1, fmap2, eii, ejj, ekk, reps=8)


# --- isolated update network (corr features precomputed) ------------------
def net_f(e_num, net_in, ctx_in, corr_in, eii, ejj, ekk):
    from dpvo_tpu.ops import graph
    from dpvo_tpu.ops.scatter import group_meta_device
    ii = eii[:bucket]
    jj = ejj[:bucket]
    kk = ekk[:bucket]
    valid = jnp.arange(bucket, dtype=jnp.int32) < e_num
    kk_g = jnp.where(valid, kk, -1)
    pair = jnp.where(valid, ii * jnp.int32(12345) + jj, -1)
    agg_meta = (group_meta_device(kk_g), group_meta_device(pair))
    nbrs = graph.neighbors(kk, jj, valid)
    net, delta, weight = update_mod.apply(
        u_params, net_in, ctx_in, corr_in, ii, jj, kk, valid,
        agg_meta=agg_meta, nbrs=nbrs)
    return live_sum((net, delta, weight))


net_in = jnp.zeros((bucket, DIM), jnp.float32)
ctx_in = jnp.zeros((bucket, DIM), jnp.float32)
corr_in = jnp.asarray(rng.normal(size=(bucket, 2 * 49 * P * P)), dt)
timed(f"update net (incl meta) bucket={bucket}", net_f, e_num,
      net_in, ctx_in, corr_in, eii, ejj, ekk, reps=8)


# --- metadata only --------------------------------------------------------
def meta_f(e_num, eii, ejj, ekk):
    from dpvo_tpu.ops import graph
    from dpvo_tpu.ops.scatter import group_meta_device
    from dpvo_tpu.ops.corr_pallas import corr_grouping_device
    ii = eii[:bucket]
    jj = ejj[:bucket]
    kk = ekk[:bucket]
    valid = jnp.arange(bucket, dtype=jnp.int32) < e_num
    kk_g = jnp.where(valid, kk, -1)
    pair = jnp.where(valid, ii * jnp.int32(12345) + jj, -1)
    agg_meta = (group_meta_device(kk_g), group_meta_device(pair))
    nbrs = graph.neighbors(kk, jj, valid)
    cg = corr_grouping_device(jnp.where(valid, jj, 0), mem, valid)
    return live_sum((agg_meta, nbrs, cg))


timed(f"edge metadata bucket={bucket}", meta_f, e_num, eii, ejj, ekk,
      reps=8)
