"""Quantified ORB-for-DISK substitution check (VERDICT r2 next#5).

Runs the synthetic revisit benchmark (scripts/dev/lc_match_bench.py):
a textured plane rendered through exact homographies, two visits
related by a known drift Sim3, the shipped ORB+BF matcher vs a
ground-truth oracle matcher through the SAME triangulate->match->
RANSAC-Umeyama pipeline (ref methods/dpvo/dpvo/loop_closure/
long_term.py:46-47 uses DISK+LightGlue; the oracle stands in for its
ceiling).

Asserted contract: the ORB path recovers the drift Sim3 within tight
absolute bounds AND is not materially worse than the oracle (the
measured gap is match recall, not Sim3 accuracy — see docs/PARITY.md).
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
