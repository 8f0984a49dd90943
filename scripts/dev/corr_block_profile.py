"""Section-level breakdown of the reproject+corr block at retain scale.

The retain-regime frame profile (frame_profile.py 45056 44640 22) shows
reproject+corr2lvl = 32 ms while the kernel alone measured ~20 ms at
this E (corr_variants.py) — this script attributes the ~10+ ms of
XLA-side work around the kernel.

Run on TPU:  python scripts/dev/corr_block_profile.py [bucket] [live] [window]
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

from dpvo_tpu.ops import projective as pops
from dpvo_tpu.ops import corr_pallas as cp

bucket = int(sys.argv[1]) if len(sys.argv) > 1 else 45056
live = int(sys.argv[2]) if len(sys.argv) > 2 else 44640
window = int(sys.argv[3]) if len(sys.argv) > 3 else 22

M, P = 96, 3
mem = pmem = 36
N = 256
h, w = 120, 160
dt = jnp.bfloat16

rng = np.random.default_rng(0)
poses = jnp.zeros((N, 7)).at[:, 6].set(1.0)
patches = jnp.asarray(rng.uniform(1, 4, (N * M, 3, P, P)), jnp.float32)
intrinsics = jnp.tile(jnp.asarray([[160., 160., 80., 60.]]), (N, 1))
gmap = jnp.asarray(rng.normal(size=(pmem * M, P, P, 128)), dt)
fmap1 = jnp.asarray(rng.normal(size=(mem, *cp.padded_hw(h, w), 128)), dt)
fmap2 = jnp.asarray(
    rng.normal(size=(mem, *cp.padded_hw(h // 4, w // 4), 128)), dt)

n_now = window * 2
kk_np = rng.integers((n_now - window) * M, n_now * M, bucket).astype(
    np.int32)
kk_np.sort()
ii_np = kk_np // M
jj_np = np.minimum(ii_np + rng.integers(1, 12, bucket), n_now).astype(
    np.int32)
eii = jnp.asarray(ii_np)
ejj = jnp.asarray(jj_np)
ekk = jnp.asarray(kk_np)
e_num = jnp.int32(live)


def mk_valid(e_num):
    return jnp.arange(bucket, dtype=jnp.int32) < e_num


def f_transform(e_num, poses, patches):
    valid = mk_valid(e_num)
    ii_s = jnp.where(valid, eii, 0)
    jj_s = jnp.where(valid, ejj, 0)
    kk_s = jnp.where(valid, ekk, 0)
    coords = pops.transform(poses, patches, intrinsics, ii_s, jj_s, kk_s)
    return jnp.clip(jnp.sum(coords), -1e6, 1e6)[None]


def f_grouping(e_num, ejj):
    valid = mk_valid(e_num)
    out = cp.corr_grouping_device(jnp.where(valid, ejj, 0), mem, valid)
    return jax.tree.leaves(out)[0][:1]


# precomputed static inputs for the isolated stages
valid0 = np.arange(bucket) < live
jj0 = np.where(valid0, jj_np, 0)
perm_np, inv_np, tf_np, nlive_np = jax.tree.map(
    np.asarray, cp.corr_grouping_device(jnp.asarray(jj0), mem,
                                        jnp.asarray(valid0)))
perm_d = jnp.asarray(perm_np)
inv_d = jnp.asarray(inv_np)
tf_d = jnp.asarray(tf_np)
coords0 = jax.jit(lambda: pops.transform(
    poses, patches, intrinsics,
    jnp.asarray(np.where(valid0, ii_np, 0)),
    jnp.asarray(jj0),
    jnp.asarray(np.where(valid0, kk_np, 0))).transpose(0, 3, 1, 2))()
kk_mod0 = jnp.asarray(np.where(valid0, kk_np, 0) % (M * pmem))


def f_gpre(kk_mod, gmap):
    Es = perm_d.shape[0]
    kk_s = kk_mod[perm_d]
    g_pre = gmap[kk_s].reshape(Es, cp.P2, 128)
    return jnp.sum(g_pre.astype(jnp.float32)).reshape(1)


def f_coord_perm(kk_mod, coords2):
    # kk_mod carries the fold-proof perturbation (int_arg=0); fold it in
    # so the body isn't loop-invariant inside microbench's fori_loop
    z = kk_mod[0] // jnp.int32(2147483647)      # 0 at runtime, opaque
    cs = (coords2 + z.astype(coords2.dtype))[perm_d]
    return jnp.clip(jnp.sum(cs), -1e6, 1e6)[None]


g_pre0 = jax.jit(lambda: gmap[kk_mod0[perm_d]].reshape(
    perm_d.shape[0], cp.P2, 128))()
coords_s0 = jnp.asarray(np.asarray(coords0)[perm_np])
nlive_d = jnp.asarray(nlive_np).reshape(1)


def f_kernel(tf_d, g_pre, fmap1, fmap2, coords_s):
    out = cp.corr_pallas_fused(g_pre, fmap1, fmap2, coords_s, tf_d,
                               n_live=nlive_d, out_dtype=dt)
    return jnp.clip(jnp.sum(out.astype(jnp.float32)), -1e6, 1e6)[None]


timed(f"transform bucket={bucket}", f_transform, e_num, poses, patches,
      reps=8)
timed(f"corr_grouping bucket={bucket}", f_grouping, e_num, ejj, reps=8)
timed(f"g_pre gather bucket={bucket}", f_gpre, kk_mod0, gmap, reps=8,
      int_arg=0)
timed(f"coords perm bucket={bucket}", f_coord_perm, kk_mod0, coords0,
      reps=8, int_arg=0)
timed(f"pallas kernel alone bucket={bucket}", f_kernel, tf_d, g_pre0,
      fmap1, fmap2, coords_s0, reps=8, int_arg=0)
print("done", flush=True)
