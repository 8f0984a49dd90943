"""Full-scale cross-engine trajectory parity at the reference operating
point (VERDICT r2 missing#3).

Same machinery as tests/test_engine_parity.py (reference torch engine on
CPU via ref_engine_harness, ours with converted weights), but at the
SHIPPED configuration: 480x640 input, M=96 patches/frame, the reference
default.yaml windows (PATCH_LIFETIME=13, REMOVAL_WINDOW=22,
OPTIMIZATION_WINDOW=10 — /root/reference/methods/dpvo/config/
default.yaml:4-7), >=60 frames, and OUR production keyframing
(ASYNC_KEYFRAME=True, lag-batched decisions) against the reference's
synchronous keyframing — measuring the async-keyframe delta at scale
rather than disabling it.

Cost: tens of CPU-minutes per engine (the reference's dense corr stub
evaluates ~45k edges x 64 taps per update in torch CPU; ours compiles
40k-edge XLA programs on CPU).  Run explicitly with:

    DPVO_FULLSCALE=1 python -m pytest tests/test_engine_parity_fullscale.py -v -s

The measured deltas (round 4: retain 5.2% of span, merge_async 1.1mm
absolute over a degenerate 6.4mm span) are recorded in docs/PARITY.md
("Full-scale trajectory parity").
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if not os.environ.get("DPVO_FULLSCALE"):
    pytest.skip("full-scale parity is gated behind DPVO_FULLSCALE=1 "
                "(tens of CPU-minutes)", allow_module_level=True)

import types

import jax

import ref_engine_harness as H
import test_engine_parity as base

HT, WD = 480, 640
FH, FW = HT // 4, WD // 4
M = 96
# >=60 frames covers the full edge-retirement cycle (PATCH_LIFETIME=13,
# REMOVAL_WINDOW=22) several times over; override to fit a time budget
# (the per-frame cost is dominated by the reference's dense corr stub).
# Clamped to 60: a shorter run never exercises edge retirement and must
# not masquerade as full-scale parity evidence (ADVICE r3).
N_FRAMES = max(int(os.environ.get("DPVO_FULLSCALE_FRAMES", "64")), 60)
DEPTH0 = 0.7
INTR = np.array([320.0, 320.0, 320.0, 240.0], np.float32)


def centroid_grid(t):
    k = np.arange(M)
    x = 1 + (7 * k + 3 * t) % (FW - 2)
    y = 1 + (5 * k + 11 * t) % (FH - 2)
    return np.stack([x, y], axis=-1).astype(np.float32)


def make_frames():
    rng = np.random.default_rng(11)
    b = rng.integers(0, 255, size=(HT, WD * 2, 3), dtype=np.uint8)
    return [np.ascontiguousarray(np.roll(b, -5 * t, axis=1)[:, :WD])
            for t in range(N_FRAMES)]


def fullscale_cfg(thresh):
    # the reference's shipped operating point (default.yaml:4-7)
    return dict(
        BUFFER_SIZE=128, PATCHES_PER_FRAME=M, PATCH_LIFETIME=13,
        REMOVAL_WINDOW=22, OPTIMIZATION_WINDOW=10, KEYFRAME_INDEX=4,
        KEYFRAME_THRESH=thresh, MOTION_MODEL="DAMPED_LINEAR",
        MOTION_DAMPING=0.5, MIXED_PRECISION=False, LOOP_CLOSURE=False,
        CLASSIC_LOOP_CLOSURE=False, CENTROID_SEL_STRAT="RANDOM")


@pytest.fixture(scope="module")
def shared_network():
    H.install_engine_stubs()
    from dpvo.net import VONet
    from dpvo_tpu.utils.checkpoint import convert_state_dict

    torch.manual_seed(42)
    net = VONet().eval()
    with torch.no_grad():   # tame delta head (see test_engine_parity)
        net.update.d[1].weight.mul_(0.02)
        net.update.d[1].bias.mul_(0.02)
    p_params, u_params = convert_state_dict(dict(net.state_dict()))
    return net, (p_params, u_params)


def run_reference(cfg_dict, net_torch, frames):
    ref_mod = H.install_engine_stubs()
    cfg_ns = types.SimpleNamespace(**cfg_dict)
    randint_state = {"count": 0}
    orig_randint, orig_rand_like = torch.randint, torch.rand_like

    def fake_randint(low, high, size=None, **kw):
        t = randint_state["count"] // 2
        which = randint_state["count"] % 2
        randint_state["count"] += 1
        g = centroid_grid(t)
        v = g[:, 0] if which == 0 else g[:, 1]
        return torch.from_numpy(v.astype(np.int64).reshape(size))

    torch.randint = fake_randint
    torch.rand_like = lambda x, **kw: torch.full_like(x, DEPTH0)
    try:
        # no_grad like the reference CLIs (ref demo.py:33): without it
        # every stored net/target/weight retains its autograd graph and
        # RSS grows ~7 GB/frame at full scale
        with H.CudaToCpu(), torch.no_grad():
            slam = ref_mod.DPVO(cfg_ns, net_torch, ht=HT, wd=WD,
                                viz=False)
            slam.motion_probe = lambda: 100.0
            import time
            for t, img in enumerate(frames):
                t0 = time.perf_counter()
                slam(t, torch.from_numpy(img).permute(2, 0, 1),
                     torch.from_numpy(INTR))
                print(f"  ref frame {t}: "
                      f"{time.perf_counter() - t0:.1f}s "
                      f"e={len(slam.pg.ii)}", file=sys.stderr, flush=True)
            poses, tstamps = slam.terminate()
    finally:
        torch.randint, torch.rand_like = orig_randint, orig_rand_like
    return poses, tstamps


def run_ours(cfg_dict, params, frames, async_kf):
    from dpvo_tpu.config import VOConfig
    from dpvo_tpu.engine import DPVO

    cfg = VOConfig(**cfg_dict, ASYNC_KEYFRAME=async_kf,
                   CORR_BACKEND="xla")
    slam = DPVO(cfg, network=params, ht=HT, wd=WD)
    slam.motion_probe = lambda: 100.0
    slam.test_centroids = centroid_grid
    slam.test_fixed_depth = DEPTH0
    import time
    for t, img in enumerate(frames):
        t0 = time.perf_counter()
        slam(t, img, INTR)
        print(f"  ours frame {t}: {time.perf_counter() - t0:.1f}s "
              f"e={slam.hs.e_num}", file=sys.stderr, flush=True)
    poses, tstamps = slam.terminate()
    return poses, tstamps


def ate_sim3(p_a, p_b):
    """Sim3-aligned ATE RMSE between two xyz+quat trajectories (the
    evaluate_tartan.py metric, evo-free)."""
    from dpvo_tpu.utils.evaluation import ate_rmse
    return ate_rmse(p_a[:, :3], p_b[:, :3])


@pytest.mark.parametrize("thresh,regime", [
    (0.0, "retain"),        # never merge: async keyframing is a no-op,
                            # pure full-scale numeric agreement at ~45k
                            # live edges
    (1e9, "merge_async"),   # every decision merges; ours applies them
                            # lag-batched (production path) vs the
                            # reference's synchronous merges — measures
                            # the async-keyframe delta at scale
])
def test_fullscale_trajectory_parity(shared_network, thresh, regime):
    net_torch, params = shared_network
    frames = make_frames()
    cfg = fullscale_cfg(thresh)

    p_ref, t_ref = run_reference(cfg, net_torch, frames)
    p_my, t_my = run_ours(cfg, params, frames, async_kf=True)

    assert p_my.shape == p_ref.shape == (N_FRAMES, 7)
    np.testing.assert_allclose(t_my, t_ref)

    err = ate_sim3(p_my, p_ref)
    span = np.linalg.norm(
        p_ref[:, :3] - p_ref[:1, :3], axis=1).max() + 1e-9
    print(f"[fullscale {regime}] ATE(ours vs ref) = {err:.5f}, "
          f"trajectory span = {span:.4f}, ratio = {err / span:.4f}",
          file=sys.stderr, flush=True)

    if regime == "retain":
        # no merges -> identical structure; differences are accumulated
        # cross-stack fp noise through ~70 GN updates at 40k+ edges with
        # RANDOM weights (a chaotic amplifier, no GT anchor).  Measured
        # round 4: 5.2% of span (docs/PARITY.md "full-scale parity") —
        # the 8% guard is a regression tripwire calibrated to that
        # measurement; the accuracy CLAIM lives in the tight toy-scale
        # parity (test_engine_parity.py) + the GT-anchored async A/B.
        assert err / span < 0.08, (err, span)
    elif span < 0.05:
        # every decision merges -> the retained trajectory is nearly
        # static (measured span 6.4mm), so err/span is degenerate;
        # bound the ABSOLUTE cross-engine ATE instead (measured 1.1mm).
        assert err < 0.01, (err, span)
    else:
        # async-keyframe delta bound: merges apply up to LAG=8 frames
        # late and trailing merges drop at terminate; BASELINE.md's
        # accuracy budget is 5% of ATE — hold the cross-engine delta
        # under that at scale
        assert err / span < 0.05, (err, span)
