"""Quantified matcher-for-DISK substitution checks (VERDICT r2 next#5,
r3 next#6).

Runs the synthetic revisit benchmark (scripts/dev/lc_match_bench.py):
a textured plane rendered through exact homographies, two visits
related by a known drift Sim3, the shipped matchers vs a ground-truth
oracle matcher through the SAME triangulate->match->RANSAC-Umeyama
pipeline (ref methods/dpvo/dpvo/loop_closure/long_term.py:46-47 uses
DISK+LightGlue; the oracle stands in for its ceiling).

Asserted contracts: (a) the ORB fallback recovers the drift Sim3
within usable absolute bounds; (b) the SIFT default (cfg.LOOP_MATCHER)
matches or beats the oracle-on-ORB-keypoints ceiling in usable
constraints AND recovers the Sim3 an order of magnitude tighter.
"""
import os.path as osp
import sys

import numpy as np
import pytest

pytest.importorskip("cv2")

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "scripts",
                            "dev"))


def test_orb_sim3_recovery_vs_oracle():
    import lc_match_bench as B

    res = B.run(seed=7, verbose=False)
    orb, oracle = res["orb"], res["oracle"]
    assert orb is not None, "ORB path failed to produce a Sim3"
    assert oracle is not None, "oracle path failed (bench geometry bug)"

    # absolute quality: enough RANSAC support and a usable Sim3
    # (drift here: 6 deg rotation, |t|=0.43, 12% scale)
    assert orb["inliers"] >= 50
    assert orb["rot_err_deg"] < 2.5
    assert orb["t_err"] < 0.2
    assert orb["scale_err_pct"] < 2.0

    # relative: not materially worse than a perfect matcher through the
    # same geometry (2x margin on each error metric)
    assert orb["rot_err_deg"] < max(2.0 * oracle["rot_err_deg"], 1.5)
    assert orb["scale_err_pct"] < max(2.0 * oracle["scale_err_pct"], 1.0)


def test_sift_default_beats_oracle_ceiling():
    """The SIFT default must close the learned-matcher gap: at least
    the oracle's usable-constraint count and a far tighter Sim3
    (measured round 4: 385 inliers @ 99% vs oracle's 224 @ 47%;
    0.013 deg / 1.2e-3 / 0.015% vs ORB's 1.27 deg / 0.11 / 0.60%)."""
    import lc_match_bench as B

    res = B.run(seed=7, verbose=False)
    sift, oracle = res["sift"], res["oracle"]
    assert sift is not None, "SIFT path failed to produce a Sim3"
    assert oracle is not None, "oracle path failed (bench geometry bug)"

    assert sift["inliers"] >= oracle["inliers"]
    assert sift["inlier_rate"] > 0.9
    assert sift["rot_err_deg"] < 0.1
    assert sift["t_err"] < 0.01
    assert sift["scale_err_pct"] < 0.1


def test_sift_survives_stress_scenarios():
    """SIFT beyond its comfort zone (VERDICT r4 next#6): per-visit
    illumination change (gain 0.6, bias -25, gamma 1.4), 15-degree
    in-plane rotation, and off-plane structure (near+far planes with
    parallax) — COMBINED.  Measured round 5: 225 inliers @ 99%,
    0.021 deg / 2.3e-3 / 0.01% — no collapse, so no learned detector
    is needed for the loop-closure substitution.  The asserted bounds
    leave ~5x margin on the measured errors."""
    import lc_match_bench as B

    res = B.run(seed=7, verbose=False, illum=(0.6, -25.0, 1.4),
                roll_deg=15.0, two_plane=True)
    sift = res["sift"]
    assert sift is not None, "SIFT failed under combined stress"
    assert sift["inliers"] >= 100
    assert sift["inlier_rate"] > 0.8
    assert sift["rot_err_deg"] < 0.2
    assert sift["t_err"] < 0.02
    assert sift["scale_err_pct"] < 0.5


def test_sift_survives_individual_stresses():
    """Each stress axis alone keeps SIFT's Sim3 tight (illum: 266 @
    98%; roll15: 150 @ 39%; two-plane: 320 @ 99% in the round-5
    capture).  Note roll15 drops the inlier RATE (upright SIFT on ORB's
    keypoint budget) but the surviving support still nails the Sim3."""
    import lc_match_bench as B

    for kw in (dict(illum=(0.6, -25.0, 1.4)), dict(roll_deg=15.0),
               dict(two_plane=True)):
        res = B.run(seed=7, verbose=False, **kw)
        sift = res["sift"]
        assert sift is not None, f"SIFT failed under {kw}"
        assert sift["inliers"] >= 100, kw
        assert sift["rot_err_deg"] < 0.2, kw
        assert sift["t_err"] < 0.02, kw
        assert sift["scale_err_pct"] < 0.5, kw
