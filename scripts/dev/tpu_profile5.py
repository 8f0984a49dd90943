"""Per-program device timing at the bench.py steady-state operating
point: drives a real engine to the merge regime, then replays each
jitted program 20x (chained through donated buffers) with one
block_until_ready per rep.  The ~30ms tunnel sync cost is amortized by
dividing (total - sync) across reps and reporting both."""
import sys
import time

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

for t in range(34):
    slam(t, np.roll(base, -4 * t, axis=1)[:, :wd], intr)
jax.block_until_ready(slam.ds.poses)
p(f"steady state: edges={slam.hs.e_num} n={slam.n}")

ds, hs = slam.ds, slam.hs
bucket = slam._edge_bucket()
p(f"bucket={bucket}")
mm_blob = slam._mm_blob()

REPS = 20


def timeit(name, fn):
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(jax.tree.leaves(out))
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn()
    jax.block_until_ready(jax.tree.leaves(out))
    per = (time.perf_counter() - t0) / REPS * 1e3
    p(f"{name:34s} {per:8.2f} ms   (first {cold*1e3:7.1f} ms)")
    return out


# --- update_step (full) ---
state = [ds.net, ds.target, ds.weight, ds.poses, ds.patches]


def make_us(run_ba, use_pallas, with_mm):
    def call():
        net, tgt, wgt, poses, patches = state
        out = kernels.update_step_dev(
            slam.params_update, poses, patches, ds.intrinsics,
            ds.imap, ds.gmap, ds.fmap1, ds.fmap2,
            net, tgt, wgt, ds.eii, ds.ejj, ds.ekk,
            np.int32(hs.e_num),
            np.int32(max(slam.n - cfg.OPTIMIZATION_WINDOW, 1)),
            np.int32(slam.n), mm_blob if with_mm else None,
            update_mod=slam.update_mod, M=slam.M, pmem=slam.pmem,
            mem=slam.mem, n_cap=slam.n_cap, k_cap=slam.k_cap,
            bucket=bucket, iterations=2, run_ba=run_ba,
            use_pallas=use_pallas,
            has_mm=with_mm and mm_blob is not None)
        state[0], state[1], state[2] = out[0], out[1], out[2]
        state[3], state[4] = out[4], out[5]
        return out

    return call


timeit("update_step full (pallas+ba+mm)", make_us(True, True, True))
timeit("update_step no-ba", make_us(False, True, True))
timeit("update_step no-mm", make_us(True, True, False))
timeit("update_step xla-corr", make_us(True, False, True))
ds.net, ds.target, ds.weight = state[0], state[1], state[2]
ds.poses, ds.patches = state[3], state[4]

# --- track_frame_u8 ---
img = jnp.asarray(np.roll(base, -4 * 40, axis=1)[:, :wd])
tf_state = [ds.poses, ds.patches, ds.intrinsics, ds.colors,
            ds.imap, ds.gmap, ds.fmap1, ds.fmap2]


def track():
    out = kernels.track_frame_u8(
        slam.params_patchify, slam.patchifier, *tf_state,
        img, np.asarray(intr, np.float32) / 4, np.int32(slam.n),
        np.float32(1.0), np.bool_(True), slam._rng,
        M=slam.M, pmem=slam.pmem, mem=slam.mem,
        motion_damping=0.5, strat="RANDOM", step=np.int32(40))
    tf_state[:] = out
    return out


timeit("track_frame_u8", track)
(ds.poses, ds.patches, ds.intrinsics, ds.colors, ds.imap, ds.gmap,
 ds.fmap1, ds.fmap2) = tf_state

# --- compact_frames ---
cf_state = [ds.poses, ds.patches, ds.intrinsics, ds.colors,
            ds.imap, ds.gmap, ds.fmap1, ds.fmap2]


def compact():
    out = kernels.compact_frames(
        *cf_state, np.int32(slam.n - 5), np.int32(slam.n),
        M=slam.M, pmem=slam.pmem, mem=slam.mem,
        shift_cap=cfg.KEYFRAME_INDEX + 3)
    cf_state[:] = out
    return out


timeit("compact_frames", compact)
(ds.poses, ds.patches, ds.intrinsics, ds.colors, ds.imap, ds.gmap,
 ds.fmap1, ds.fmap2) = cf_state

# --- bucketed permute ---
perm = np.random.default_rng(1).permutation(bucket).astype(np.int32)
pe_state = [ds.net, ds.target, ds.weight, ds.eii, ds.ejj, ds.ekk]


def permute():
    out = kernels.permute_edges_b(*pe_state, perm, np.int32(hs.e_num),
                                  bucket=bucket)
    pe_state[:] = out
    return out


timeit("permute_edges_b (bucket)", permute)
(ds.net, ds.target, ds.weight, ds.eii, ds.ejj, ds.ekk) = pe_state


# --- append_edges ---
ae_state = [ds.eii, ds.ejj, ds.ekk, ds.net]


def append():
    out = kernels.append_edges(ae_state[0], ae_state[1], ae_state[2],
                               ae_state[3],
                               np.zeros(2 * 4096, np.int32),
                               np.int32(100), M=slam.M, chunk=4096)
    ae_state[:] = out
    return out


timeit("append_edges chunk=4096", append)
ds.eii, ds.ejj, ds.ekk, ds.net = ae_state

# --- split_blob upload (metadata) ---
blob = np.zeros(bucket * 15 + 8 * 256, np.int32)
sizes = tuple([bucket] * 15 + [256] * 8)


def upload():
    return kernels.split_blob(blob, sizes, bools=(3,))


timeit("split_blob 15xbucket upload", upload)

p("done")
