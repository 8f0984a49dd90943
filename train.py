#!/usr/bin/env python
"""Train VONet on TPU (ref methods/dpvo/train.py).

    python train.py configs/tartan_train.yaml

The whole step — encoders, 18-step recurrent rollout with differentiable
BA, loss, grads, AdamW — is one jitted XLA program; with more than one
chip visible it runs data-parallel over a ``dp`` mesh automatically.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

from dpvo_tpu.config import load_train_config
from dpvo_tpu.models.update import Update, DIM
from dpvo_tpu.models.vonet import Patchifier, normalize_images
from dpvo_tpu.ops import lie
from dpvo_tpu.parallel import make_mesh, replicate, shard_batch
from dpvo_tpu.parallel.train_step import (TrainState, make_eval_step,
                                          make_optimizer, make_train_step)
from dpvo_tpu.training import rollout as R
from dpvo_tpu.utils.checkpoint import (load_network, load_train_state,
                                       save_network, save_train_state)
from dpvo_tpu.utils.logger import Logger


def prepare_batch(rng, images, poses, disps, intrinsics, M, steps,
                  e_cap=None):
    """Host-side batch prep: normalization, feature-res downsample,
    centroid sampling, schedule build (ref net.py:186-208)."""
    B, N, H, W, _ = images.shape
    h, w = H // 4, W // 4

    images = 2.0 * (images / 255.0) - 0.5
    intrinsics = intrinsics / 4.0
    disps_feat = disps[:, :, 1::4, 1::4]        # ref net.py:189

    coords = np.stack([
        rng.integers(1, w - 1, size=(B, N, M)),
        rng.integers(1, h - 1, size=(B, N, M)),
    ], axis=-1).astype(np.float32)

    sch = R.build_schedule(N, M, steps, rng)
    if e_cap is not None:
        sch = R.pad_schedule(sch, e_cap)

    # inverse GT poses (ref train.py:300)
    poses_inv = np.asarray(lie.se3_inv(jnp.asarray(poses)))

    return {
        "images": images.astype(np.float32),
        "poses": poses_inv.astype(np.float32),
        "disps": disps_feat.astype(np.float32),
        "intrinsics": intrinsics.astype(np.float32),
        "coords": coords,
        "depth_init": rng.uniform(0.0, 1.0, (B, N * M)).astype(np.float32),
        "sch_ii": sch.ii, "sch_jj": sch.jj, "sch_kk": sch.kk,
        "sch_active": sch.active, "sch_fresh": sch.fresh,
        "sch_intro": sch.intro,
    }


def train(config):
    from dpvo_tpu.data.factory import dataset_factory
    from dpvo_tpu.data.loader import make_loader

    tcfg = config["training"]
    dcfg = config["dataset"]
    steps_total = tcfg["steps"]
    STEPS = tcfg.get("iters", 18)
    M = tcfg.get("M", 80)
    n_frames = dcfg.get("n_frames", 15)

    # optional chip-count cap (training.devices) — e.g. reserve chips for
    # a concurrent eval job, or shrink the dp mesh for small datasets
    mesh = make_mesh(tcfg.get("devices"))
    n_dev = len(mesh.devices.flat)
    B = max(tcfg.get("batch_size", 1), n_dev)

    reader_kw = dict(
        n_frames=n_frames, fmin=dcfg.get("fmin", 16.0),
        fmax=dcfg.get("fmax", 60.0),
        crop_size=tuple(dcfg.get("crop_size", (480, 640))),
        aug=dcfg.get("aug", True))
    if dcfg.get("cache_dir"):
        reader_kw["cache_dir"] = dcfg["cache_dir"]
    db = dataset_factory(dcfg["names"], datapath=dcfg["roots"][0],
                         **reader_kw)
    loader = make_loader(db, batch_size=B,
                         num_workers=config["dataloader"]["num_workers"],
                         prefetch=config["dataloader"]["prefetch"])

    dtype = jnp.bfloat16 if tcfg.get("amp", True) else jnp.float32
    patchifier = Patchifier(3, dtype=dtype)
    update_mod = Update(3, dtype=dtype)

    key = jax.random.PRNGKey(0)
    ckpt = tcfg.get("ckpt")
    if ckpt:
        p_params, u_params = load_network(ckpt)
    else:
        p_params = patchifier.init(key, jnp.zeros((1, 64, 64, 3)),
                                   jnp.zeros((1, 4, 2)))
        u_params = update_mod.init(
            key, jnp.zeros((8, DIM)), jnp.zeros((8, DIM)),
            jnp.zeros((8, 2 * 49 * 9)), jnp.zeros((8,), jnp.int32),
            jnp.zeros((8,), jnp.int32), jnp.zeros((8,), jnp.int32))
    params = {"patchify": p_params, "update": u_params}

    tx = make_optimizer(tcfg["lr"], steps_total,
                        weight_decay=tcfg["weight_decay"],
                        clip=tcfg["clip"],
                        scheduler=config["scheduler"]["type"],
                        pct_start=config["scheduler"].get("pct_start", 0.01))
    state = TrainState(params, tx.init(params), jnp.int32(0))
    # full resume: params + optimizer state + step (SURVEY §5 bar; the
    # reference's train.py:374-378 restores params only)
    resume = tcfg.get("resume")
    if resume:
        state = load_train_state(resume, state)
        print(f"resumed from {resume} at step {int(state.step)}")
    state = replicate(mesh, state)

    logger = Logger(tcfg.get("name", "dpvo_tpu"))
    rng = np.random.default_rng(0)

    fw = config["loss"].get("flow_weight", 0.1)
    pw = config["loss"].get("pose_weight", 10.0)

    # one fixed edge capacity for all samples -> one compiled program
    probe = R.build_schedule(n_frames, M, STEPS,
                             np.random.default_rng(0), dropout_p=0.0)
    e_cap = len(probe.ii)

    steps_fns = {}

    def get_step(structure_only):
        if structure_only not in steps_fns:
            steps_fns[structure_only] = make_train_step(
                patchifier, update_mod, tx, steps=STEPS, M=M,
                structure_only=structure_only, flow_weight=fw,
                pose_weight=pw, mesh=mesh)
        return steps_fns[structure_only]

    total_steps = int(state.step) if resume else 0
    save_freq = tcfg.get("save_freq", 10000)
    warmup = tcfg.get("structure_warmup", 1000)
    val_cfg = config.get("validation", {})
    val_freq = val_cfg.get("freq", 10000)
    val_enabled = val_cfg.get("enabled", False)

    # validation set: real samples from the held-out split (ref
    # train.py:28-131 validates on tartan's test_split scenes)
    val_samples = []
    eval_step = None
    if val_enabled:
        try:
            # no augmentation for validation: random ColorJitter/crops
            # would make the validation loss unreproducible run-to-run
            val_kw = dict(reader_kw, aug=False)
            val_db = dataset_factory(
                dcfg["names"], datapath=dcfg["roots"][0],
                mode="validation", **val_kw)
            val_loader = make_loader(val_db, batch_size=1, num_workers=0,
                                     prefetch=1, shuffle=False)
            vrng = np.random.default_rng(7)
            n_val = val_cfg.get("n_samples", 4)
            for vb in val_loader:
                if len(val_samples) >= n_val:
                    break
                vimages, vposes, vdisps, vintr = vb
                prepared = prepare_batch(vrng, vimages, vposes, vdisps,
                                         vintr, M, STEPS, e_cap=e_cap)
                val_samples.append(
                    {"_batch": {k: jnp.asarray(v)
                                for k, v in prepared.items()},
                     "poses": prepared["poses"][0]})
            eval_step = make_eval_step(patchifier, update_mod,
                                       steps=STEPS, M=M, mesh=mesh)
            print(f"validation set: {len(val_samples)} samples")
        except Exception as e:
            val_enabled = False
            print(f"validation disabled (no validation data): {e}")

    if len(db) < B:
        raise RuntimeError(
            f"dataset has {len(db)} samples but the global batch is {B} "
            f"(batch_size={tcfg.get('batch_size', 1)} over {n_dev} "
            "device(s)); with drop_last the loader would never yield — "
            "add data or reduce training.devices/batch_size")

    while total_steps < steps_total:
        for batch_np in loader:
            images, poses, disps, intrinsics = batch_np
            so = total_steps < warmup and ckpt is None

            batch = prepare_batch(rng, images, poses, disps, intrinsics,
                                  M, STEPS, e_cap=e_cap)
            with mesh:
                sharded = {k: (jnp.asarray(v) if k.startswith("sch_")
                               else shard_batch(mesh, jnp.asarray(v)))
                           for k, v in batch.items()}
                state, metrics = get_step(so)(state, sharded)

            logger.push({k: float(v) for k, v in metrics.items()})
            total_steps += 1

            if val_enabled and val_samples \
                    and total_steps % val_freq == 0:
                from dpvo_tpu.training.validate import validate

                def run_rollout(sample, _state=state):
                    # forward-only rollout (NO optimizer update)
                    est, _ = eval_step(_state.params, sample["_batch"])
                    return {"poses": np.asarray(est[0])}   # (S, N, 7)

                stats = validate(run_rollout, val_samples, logger,
                                 total_steps,
                                 make_figures=val_cfg.get("figures",
                                                          False))
                print(f"step {total_steps} validation: {stats}")

            if total_steps % save_freq == 0:
                os.makedirs("checkpoints", exist_ok=True)
                name = tcfg.get("name", "dpvo_tpu")
                path = f"checkpoints/{name}_{total_steps:06d}.npz"
                save_network(path, state.params["patchify"],
                             state.params["update"])
                # full state for resume (optimizer + step)
                save_train_state(
                    f"checkpoints/{name}_{total_steps:06d}_state.npz",
                    state)
                print(f"saved {path} (+_state.npz)")

            if total_steps >= steps_total:
                break

    print(f"Training completed at step {total_steps}")
    return state


if __name__ == "__main__":
    config_path = sys.argv[1] if len(sys.argv) > 1 else "configs/tartan_train.yaml"
    config = load_train_config(config_path)
    train(config)
