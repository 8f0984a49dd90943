"""Fine-grained decomposition of the bench steady state: time each engine
device call in isolation at bench shapes, plus a per-frame sync-point walk."""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

from dpvo_tpu.config import VOConfig
from dpvo_tpu.engine import DPVO, kernels


def p(*a):
    print(*a, file=sys.stderr, flush=True)


cfg = VOConfig(BUFFER_SIZE=256, MIXED_PRECISION=True, LOOP_CLOSURE=False,
               EDGE_CAPACITY=57344)
ht, wd = 480, 640
slam = DPVO(cfg, network=None, ht=ht, wd=wd)
slam.motion_probe = lambda: 100.0

rng = np.random.default_rng(0)
base = rng.integers(0, 255, size=(ht, wd * 2, 3), dtype=np.uint8)
intr = np.array([320.0, 320.0, 320.0, 240.0])


def frame(t):
    return np.roll(base, -4 * t, axis=1)[:, :wd]


# reach steady state
for t in range(26):
    slam(t, frame(t), intr)
jax.block_until_ready(slam.ds.poses)
p(f"steady state: n={slam.n} e_num={slam.hs.e_num} "
  f"bucket={slam._edge_bucket()} pallas={slam.use_pallas}")

# --- time each phase in isolation ---
ds, hs = slam.ds, slam.hs

# 1. track_frame
img = jnp.asarray(frame(26))
from dpvo_tpu.models.vonet import normalize_images, select_centroids
imgn = normalize_images(img)
h, w = ht // 4, wd // 4
coords = select_centroids(slam.next_rng(), cfg.CENTROID_SEL_STRAT, 1, h, w,
                          slam.M)[0]


def run_track():
    return kernels.track_frame(
        slam.params_patchify, slam.patchifier,
        ds.poses, ds.patches, ds.intrinsics, ds.colors,
        ds.imap, ds.gmap, ds.fmap1, ds.fmap2, imgn, coords,
        jnp.asarray(intr, jnp.float32) / 4, jnp.int32(slam.n),
        jnp.float32(1.0), jnp.asarray(True), slam.next_rng(),
        M=slam.M, pmem=slam.pmem, mem=slam.mem,
        motion_damping=0.5)


# NOTE: donation invalidates ds buffers; rebind each run
for name, fn in [("track_frame", run_track)]:
    outs = fn()   # compile + rebind
    (ds.poses, ds.patches, ds.intrinsics, ds.colors, ds.imap, ds.gmap,
     ds.fmap1, ds.fmap2) = outs
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        outs = fn()
        jax.block_until_ready(outs)
        (ds.poses, ds.patches, ds.intrinsics, ds.colors, ds.imap, ds.gmap,
         ds.fmap1, ds.fmap2) = outs
        ts.append(time.perf_counter() - t0)
    p(f"{name}: {1e3*np.median(ts):.1f}ms")

# 2/3. update_step_dev (both backends, with/without BA) — all per-update
# metadata is computed in-program from the device edge tables
bucket = slam._edge_bucket()
t0v, t1v = np.int32(max(slam.n - cfg.OPTIMIZATION_WINDOW, 1)), \
    np.int32(slam.n)

for use_pallas, run_ba in ((True, True), (False, True), (False, False)):
    kw = dict(update_mod=slam.update_mod, M=slam.M, pmem=slam.pmem,
              mem=slam.mem, n_cap=slam.n_cap, k_cap=slam.k_cap,
              bucket=bucket, iterations=2, run_ba=run_ba,
              use_pallas=use_pallas, has_mm=False)

    def call_us():
        return kernels.update_step_dev(
            slam.params_update, ds.poses, ds.patches, ds.intrinsics,
            ds.imap, ds.gmap, ds.fmap1, ds.fmap2,
            ds.net, ds.target, ds.weight,
            ds.eii, ds.ejj, ds.ekk, np.int32(hs.e_num),
            t0v, t1v, None, **kw)

    outs = call_us()
    (ds.net, ds.target, ds.weight, _d, ds.poses, ds.patches, _m) = outs
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        outs = call_us()
        jax.block_until_ready(outs)
        (ds.net, ds.target, ds.weight, _d, ds.poses, ds.patches,
         _m) = outs
        ts.append(time.perf_counter() - t0)
    p(f"update_step_dev(pallas={use_pallas}, ba={run_ba}) "
      f"bucket={bucket}: {1e3*np.median(ts):.1f}ms")

# 4. flowmag_pair (motionmag building block)
i, j = slam.n - cfg.KEYFRAME_INDEX - 1, slam.n - cfg.KEYFRAME_INDEX + 1
t0 = time.perf_counter()
m = slam.motionmag(i, j)
p(f"motionmag (cold-ish): {1e3*(time.perf_counter()-t0):.1f}ms -> {m:.2f}")
ts = []
for _ in range(10):
    t0 = time.perf_counter()
    m = slam.motionmag(i, j)
    ts.append(time.perf_counter() - t0)
p(f"motionmag steady: {1e3*np.median(ts):.1f}ms")

# 5. permute_edges_b (remove_factors device part, bucketed)
perm = np.arange(bucket, dtype=np.int32)
ts = []
for _ in range(10):
    t0 = time.perf_counter()
    (ds.net, ds.target, ds.weight, ds.eii, ds.ejj,
     ds.ekk) = kernels.permute_edges_b(
        ds.net, ds.target, ds.weight, ds.eii, ds.ejj, ds.ekk,
        perm, np.int32(hs.e_num), bucket=bucket)
    jax.block_until_ready(ds.net)
    ts.append(time.perf_counter() - t0)
p(f"permute_edges_b bucket={bucket}: {1e3*np.median(ts):.1f}ms")

# 6. compact_frames
outs = kernels.compact_frames(
    ds.poses, ds.patches, ds.intrinsics, ds.colors, ds.imap, ds.gmap,
    ds.fmap1, ds.fmap2, jnp.int32(10), jnp.int32(slam.n),
    M=slam.M, pmem=slam.pmem, mem=slam.mem,
    shift_cap=cfg.KEYFRAME_INDEX + 2)
(ds.poses, ds.patches, ds.intrinsics, ds.colors, ds.imap, ds.gmap,
 ds.fmap1, ds.fmap2) = outs
ts = []
for _ in range(10):
    t0 = time.perf_counter()
    outs = kernels.compact_frames(
        ds.poses, ds.patches, ds.intrinsics, ds.colors, ds.imap, ds.gmap,
        ds.fmap1, ds.fmap2, jnp.int32(10), jnp.int32(slam.n),
        M=slam.M, pmem=slam.pmem, mem=slam.mem,
        shift_cap=cfg.KEYFRAME_INDEX + 2)
    jax.block_until_ready(outs)
    (ds.poses, ds.patches, ds.intrinsics, ds.colors, ds.imap, ds.gmap,
     ds.fmap1, ds.fmap2) = outs
    ts.append(time.perf_counter() - t0)
p(f"compact_frames: {1e3*np.median(ts):.1f}ms")
