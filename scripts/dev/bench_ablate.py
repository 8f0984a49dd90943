"""Ablation bench: frame rate with engine stages disabled one at a time
(no timing syncs, steady state) to attribute wall time in an environment
where every host sync costs ~32ms."""
import sys
import time

import numpy as np
import jax

from dpvo_tpu.config import VOConfig
from dpvo_tpu.engine import DPVO


def p(*a):
    print(*a, file=sys.stderr, flush=True)


def run(label, patch=None, n_warm=34, n_bench=20):
    cfg = VOConfig(BUFFER_SIZE=256, MIXED_PRECISION=True,
                   LOOP_CLOSURE=False, EDGE_CAPACITY=57344)
    ht, wd = 480, 640
    slam = DPVO(cfg, network=None, ht=ht, wd=wd)
    slam.motion_probe = lambda: 100.0
    if patch:
        patch(slam)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, size=(ht, wd * 2, 3), dtype=np.uint8)
    intr = np.array([320.0, 320.0, 320.0, 240.0])

    def frame(t):
        return np.roll(base, -4 * t, axis=1)[:, :wd]

    for t in range(n_warm):
        slam(t, frame(t), intr)
    jax.block_until_ready(slam.ds.poses)
    t0 = time.perf_counter()
    for t in range(n_warm, n_warm + n_bench):
        slam(t, frame(t), intr)
    jax.block_until_ready(slam.ds.poses)
    dt = (time.perf_counter() - t0) / n_bench
    p(f"{label:28s} {1e3*dt:7.1f} ms/frame  ({1/dt:5.2f} FPS)")


run("full")
# skip merges but keep edge retirement (else the table overflows)
run("no merge", lambda s: setattr(s, "_keyframe_apply",
                                  lambda m, tcand: None))


def no_update(s):
    # no update_step; keyframe still retires edges (no mags -> no merges)
    s.update = lambda: None


run("no update", no_update)


def no_append(s):
    s.append_factors = lambda *a: None
    s.update = lambda: None
    s.keyframe = lambda: None


run("track only", no_append)


def no_ba(s):
    orig = s._call_update_step

    def wrapped(ds, bucket, t0, t1, run_ba, mm_blob=None):
        return orig(ds, bucket, t0, t1, False, mm_blob)

    s._call_update_step = wrapped


run("no BA", no_ba)
run("corr XLA", lambda s: setattr(s, "use_pallas", False))


def no_mm(s):
    s._mm_blob = lambda: None
    s._keyframe_apply = lambda m, tcand: None


run("no in-step motionmag", no_mm)
