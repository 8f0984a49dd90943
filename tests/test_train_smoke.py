"""Train-loop smoke: the REAL ``train.py::train`` on synthetic data.

VERDICT r1 item 10: prove the full loop — dataset build (pickle cache +
flow graph) -> loader -> prepare_batch -> sharded train step ->
logging -> checkpoint/save — beyond single-step tests, with enough real
optimizer steps to show the loss moving down.

Uses the synthetic TartanAir-format scene generator from
tests/test_e2e_data_eval.py (real PNG/NPY files on disk) plus a second
scene named into the validation split, so the held-out-split indexing
path runs too.
"""
from __future__ import annotations

import json
import os
import os.path as osp

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import test_e2e_data_eval as E

STEPS_TOTAL = 150  # ~20 epochs over the 7-sample synthetic scene


@pytest.fixture(scope="module")
def train_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tartan_train"))
    # geometrically consistent: 2 px/frame texture roll at depth 2 and
    # fx 320 -> t = 5 * 2 * 2 / 320 raw NED units per frame, so the GT
    # (pose, depth)-induced flow matches what the images actually do and
    # the flow loss is learnable
    E._make_scene(root, step=5 * 2 * 2.0 / 320.0)
    return root


def _metric(jsonl_path, key):
    out = []
    with open(jsonl_path) as f:
        for line in f:
            rec = json.loads(line)
            if key in rec:
                out.append(rec[key])
    return out


def test_train_loop_smoke(train_root, tmp_path, monkeypatch):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "repo_train", osp.join(E._REPO, "train.py"))
    train_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(train_mod)

    monkeypatch.chdir(tmp_path)  # runs/ + checkpoints/ land here

    config = {
        "dataset": {
            "names": ["tartan"],
            "roots": [train_root],
            "n_frames": 5,
            "fmin": 8.0, "fmax": 100.0,
            "crop_size": [48, 64],
            "aug": False,               # deterministic geometry
            "cache_dir": str(tmp_path / "cache"),
        },
        "training": {
            "steps": STEPS_TOTAL,
            "iters": 3,                 # rollout steps
            "M": 4,
            "batch_size": 1,
            "devices": 2,               # 2-way dp over the CPU mesh
            "lr": 1e-3,
            "weight_decay": 1e-5,
            "clip": 10.0,
            "amp": False,               # fp32 on CPU
            "structure_warmup": 0,
            "save_freq": STEPS_TOTAL,
            "name": "smoke",
        },
        "scheduler": {"type": "constant"},
        "loss": {"flow_weight": 0.1, "pose_weight": 10.0},
        "dataloader": {"num_workers": 0, "prefetch": 2},
        "validation": {"enabled": False},
    }

    # SUM_FREQ=100 would never flush in 60 steps; flush every 10
    from dpvo_tpu.utils import logger as L
    monkeypatch.setattr(L, "SUM_FREQ", 10)

    state = train_mod.train(config)

    assert int(np.asarray(state.step)) == STEPS_TOTAL

    # checkpoints written (network + full train state for resume)
    assert osp.isfile(f"checkpoints/smoke_{STEPS_TOTAL:06d}.npz")
    assert osp.isfile(f"checkpoints/smoke_{STEPS_TOTAL:06d}_state.npz")

    # metric trajectories: 10-step running means from the JSONL sink
    losses = _metric("runs/smoke/metrics.jsonl", "loss")
    ro = _metric("runs/smoke/metrics.jsonl", "ro")
    assert len(losses) >= STEPS_TOTAL // 10
    assert all(np.isfinite(losses)), losses
    # monotone-ish decrease (measured trajectory: loss 9.7 -> ~5.9,
    # rotation error 0.12 -> ~0.01 over 150 steps): total loss must drop
    # >=20% and the rotation pose term >=50% between the first and last
    # windows.  flow_err is NOT asserted — at this tiny resolution it
    # bottoms out near its irreducible ~12 px floor while the pose terms
    # keep learning; exact monotonicity is too strict for SGD noise.
    assert np.mean(losses[-3:]) < 0.8 * np.mean(losses[:2]), losses
    assert np.mean(ro[-3:]) < 0.5 * np.mean(ro[:2]), ro

    # the saved network must load back as a usable params tree
    import jax
    from dpvo_tpu.utils.checkpoint import load_network
    p_params, u_params = load_network(
        f"checkpoints/smoke_{STEPS_TOTAL:06d}.npz")
    assert len(jax.tree_util.tree_leaves(p_params)) > 10
    assert len(jax.tree_util.tree_leaves(u_params)) > 10
