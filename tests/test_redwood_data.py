"""Redwood reader driven end-to-end on a synthetic on-disk scene
(VERDICT r3 missing#4).

Mirrors what tests/test_e2e_data_eval.py does for TartanAir, in the
Redwood on-disk format (ref dpvo/data_readers/redwood.py:96-208):
root/{train}/{scene}/{image/*.jpg, depth/*.png, {scene}.json} with a
shared root/intrinsic.npy — uint16 millimetre depth PNGs and a
PoseGraph JSON whose node poses are COLUMN-major 4x4 matrices.  Drives
Redwood._build_dataset -> __getitem__ -> one real optimizer step.
"""
from __future__ import annotations

import json
import os
import os.path as osp

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
pytest.importorskip("scipy")

HT, WD = 64, 96
N_SYN = 72          # base._build_dataset_index needs > 65 frames
DEPTH_M = 2.0       # 2000 mm in the uint16 PNGs
FX = 320.0
# induced flow per frame = fx * step * (1/depth) = 24 px: adjacent
# pairs land inside the default (fmin, fmax) co-visibility window
STEP = 0.15


def _make_redwood_scene(root):
    scene = osp.join(root, "train", "scene01")
    os.makedirs(osp.join(scene, "image"))
    os.makedirs(osp.join(scene, "depth"))

    K = np.array([[FX, 0.0, WD / 2], [0.0, FX, HT / 2], [0.0, 0.0, 1.0]])
    np.save(osp.join(root, "intrinsic.npy"), K)

    rng = np.random.default_rng(3)
    base = rng.integers(0, 255, size=(HT, WD * 3, 3), dtype=np.uint8)
    base = cv2.GaussianBlur(base, (5, 5), 0)

    nodes = []
    for t in range(N_SYN):
        img = np.ascontiguousarray(np.roll(base, -2 * t, axis=1)[:, :WD])
        cv2.imwrite(osp.join(scene, "image", f"{t:06d}.jpg"), img)
        depth_mm = np.full((HT, WD), DEPTH_M * 1000.0, np.float64) \
            + 100.0 * np.sin(np.arange(WD) / 7.0)[None, :]
        cv2.imwrite(osp.join(scene, "depth", f"{t:06d}.png"),
                    depth_mm.astype(np.uint16))
        T = np.eye(4)
        T[0, 3] = STEP * t           # lateral camera translation
        # the reader transposes: store column-major (ref redwood.py:187)
        nodes.append({"pose": T.T.flatten().tolist()})
    with open(osp.join(scene, "scene01.json"), "w") as f:
        json.dump({"nodes": nodes}, f)
    return scene


@pytest.fixture(scope="module")
def redwood_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("redwood"))
    _make_redwood_scene(root)
    return root


def test_build_getitem_and_cache(redwood_root):
    from dpvo_tpu.data.redwood import Redwood

    ds = Redwood(mode="train", datapath=redwood_root, n_frames=4,
                 crop_size=(48, 64))
    assert len(ds) > 0, "no samples indexed"

    info = ds.scene_info["train/scene01"]
    assert len(info["images"]) == N_SYN
    # poses decoded from the column-major JSON: x grows by STEP/frame,
    # identity rotation (quat ~ [0,0,0,1])
    poses = info["poses"]
    np.testing.assert_allclose(poses[:, 0], STEP * np.arange(N_SYN),
                               atol=1e-5)
    np.testing.assert_allclose(poses[:, 3:6], 0.0, atol=1e-6)

    # co-visibility graph: nearer frames have smaller flow
    js, flows = info["graph"][0]
    near = dict(zip(js.tolist(), flows.tolist()))
    assert near[1] < near[2] < near[3], near

    images, gposes, disps, intrinsics = ds[0]
    assert images.shape == (4, 48, 64, 3)
    assert gposes.shape == (4, 7)
    assert disps.shape == (4, 48, 64)
    assert intrinsics.shape == (4, 4)
    assert np.isfinite(images).all() and np.isfinite(disps).all()
    # uint16 mm -> metres -> 0.7*q98-normalized disparity
    assert abs(np.quantile(disps, 0.98) - 1.0 / 0.7) < 0.1

    # the pickle cache lives inside the dataset root (ref redwood.py:47)
    assert osp.isfile(osp.join(redwood_root, "cache",
                               "Redwood_train.pickle"))
    ds2 = Redwood(mode="train", datapath=redwood_root, n_frames=4,
                  crop_size=(48, 64))
    assert len(ds2) == len(ds)


def test_factory_and_one_train_step(redwood_root):
    """dataset_factory('redwood') sample -> prepare_batch -> one real
    optimizer step with finite, nonzero loss."""
    import importlib.util

    import jax.numpy as jnp

    from dpvo_tpu.data.factory import dataset_factory
    from dpvo_tpu.models.update import Update, DIM
    from dpvo_tpu.models.vonet import Patchifier
    from dpvo_tpu.parallel.train_step import (TrainState, make_optimizer,
                                              make_train_step)

    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "repo_train", osp.join(repo, "train.py"))
    train_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(train_mod)

    db = dataset_factory(["redwood"], mode="train", datapath=redwood_root,
                         n_frames=4, crop_size=(48, 64))
    images, poses, disps, intrinsics = db[0]

    rng = np.random.default_rng(0)
    N, M, S = 4, 4, 3
    batch = train_mod.prepare_batch(
        rng, images[None], poses[None], disps[None], intrinsics[None],
        M=M, steps=S)

    import jax
    key = jax.random.PRNGKey(0)
    patchifier = Patchifier(3, dtype=jnp.float32)
    update_mod = Update(3, dtype=jnp.float32)
    p_params = patchifier.init(key, jnp.zeros((N, 48, 64, 3)),
                               jnp.ones((N, M, 2)) * 4.0)
    u_params = update_mod.init(
        key, jnp.zeros((8, DIM)), jnp.zeros((8, DIM)),
        jnp.zeros((8, 2 * 49 * 9)), jnp.zeros((8,), jnp.int32),
        jnp.zeros((8,), jnp.int32), jnp.zeros((8,), jnp.int32))
    params = {"patchify": p_params, "update": u_params}

    tx = make_optimizer(1e-4, steps=10)
    state = TrainState(params, tx.init(params), jnp.int32(0))
    step_fn = make_train_step(patchifier, update_mod, tx, steps=S, M=M)
    state, metrics = step_fn(state, batch)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) > 0.0
