"""Data-parallel training step over a device mesh.

The full training step — encoders, patch extraction, 18-step recurrent
rollout with differentiable BA, loss, grad, optax update — as ONE jitted
XLA program.  Parameters/optimizer state are replicated (PartitionSpec())
and the batch is sharded over the ``dp`` mesh axis; XLA inserts the
gradient all-reduce over ICI (this is a new capability — the reference is
single-GPU only, SURVEY.md §2.2).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.vonet import Patchifier
from ..models.update import Update
from ..ops import corr as corr_ops
from ..training import rollout as R


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Any


def make_optimizer(lr, steps, weight_decay=1e-6, clip=10.0,
                   scheduler="onecycle", pct_start=0.01):
    """AdamW + scheduler + global-norm clip (ref train.py:245-270, 343)."""
    if scheduler == "onecycle":
        sched = optax.linear_onecycle_schedule(
            transition_steps=steps, peak_value=lr, pct_start=pct_start,
            pct_final=1.0, div_factor=25.0, final_div_factor=1e4)
    elif scheduler == "cosine":
        sched = optax.cosine_decay_schedule(lr, steps, alpha=1e-7 / lr)
    elif scheduler == "step":
        sched = optax.piecewise_constant_schedule(
            lr, {steps // 3: 0.1, 2 * steps // 3: 0.1})
    elif scheduler == "constant":
        sched = lr
    else:
        raise ValueError(f"Unknown scheduler type: {scheduler}")
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(sched, weight_decay=weight_decay),
    )


def make_train_step(patchifier: Patchifier, update_mod: Update, tx,
                    steps=18, M=80, structure_only=False,
                    flow_weight=0.1, pose_weight=10.0, mesh=None):
    """Returns a jitted train_step(state, batch) -> (state, metrics).

    batch dict (leading axis = per-device batch, sharded over 'dp'):
      images      (B, N, H, W, 3) float normalized
      poses       (B, N, 7) inverse GT poses (world-from-camera)
      disps       (B, N, h, w) GT inverse depth at feature res
      intrinsics  (B, N, 4) feature-res
      coords      (B, N, M, 2) patch centroids
      depth_init  (B, N*M) random initial inverse depths
      sch_*       schedule arrays (shared across batch: (E,), (S, E), (S,))
    """

    def sample_loss(params, images, poses, disps, intrinsics, coords,
                    depth_init, sch):
        fmap, gmap, imap, patches_gt, _, _ = patchifier.apply(
            params["patchify"], images, coords, disps=disps)
        fmap1 = fmap                               # (N, h, w, 128)
        fmap4 = corr_ops.avg_pool2d(fmap, 4)

        K = patches_gt.shape[0] * patches_gt.shape[1]
        Pp = patches_gt.shape[-1]
        patches_gt = patches_gt.reshape(K, 3, Pp, Pp)
        gmap = gmap.reshape(K, Pp, Pp, -1)
        imap = imap.reshape(K, -1)

        patches_init = patches_gt.at[:, 2].set(
            jnp.broadcast_to(depth_init[:, None, None], (K, Pp, Pp)))

        out = R.vonet_rollout(
            params["update"], imap, gmap, fmap1, fmap4,
            patches_init, patches_gt, poses, intrinsics,
            sch["ii"], sch["jj"], sch["kk"], sch["active"], sch["fresh"],
            sch["intro"],
            update_mod=update_mod, structure_only=structure_only,
            steps=steps, M=M)

        tr, ro, fr = R.pose_loss_terms(out["poses"], poses)
        S = out["flow_err"].shape[0]
        w_step = jnp.ones((S,))
        loss = flow_weight * jnp.sum(out["flow_err"] * w_step)
        if not structure_only:
            pose_mask = jnp.arange(S) >= 2          # train.py:336
            loss = loss + pose_weight * jnp.sum((tr + ro) * pose_mask)
        metrics = {
            "flow_err": out["flow_err"][-1],
            "px1": out["px1"][-1],
            "tr": tr[-1],
            "ro": ro[-1],
            # threshold metrics + the reference's constant-zero kl term
            # (ref net.py:259 returns kl = 0; train.py:339 adds it to the
            # loss and :352 logs it — kept for log-schema parity)
            "r1": fr["r1"][-1], "r2": fr["r2"][-1],
            "t1": fr["t1"][-1], "t2": fr["t2"][-1],
            "kl": jnp.float32(0.0),
        }
        return loss, metrics

    def loss_fn(params, batch):
        sch = {k[4:]: batch[k] for k in batch if k.startswith("sch_")}
        losses, metrics = jax.vmap(
            sample_loss, in_axes=(None, 0, 0, 0, 0, 0, 0, None))(
                params, batch["images"], batch["poses"], batch["disps"],
                batch["intrinsics"], batch["coords"], batch["depth_init"],
                sch)
        return jnp.mean(losses), jax.tree.map(jnp.mean, metrics)

    def train_step(state: TrainState, batch):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, loss=loss,
                       gnorm=optax.global_norm(grads))
        return TrainState(params, opt_state, state.step + 1), metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        dp = NamedSharding(mesh, P("dp"))

        def batch_sharding(batch):
            return {k: (repl if k.startswith("sch_") else dp)
                    for k in batch}

        return jax.jit(
            train_step,
            in_shardings=(
                TrainState(repl, repl, repl),
                None),   # inferred from device_put placement
            out_shardings=(TrainState(repl, repl, repl), repl),
            donate_argnums=(0,))
    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(patchifier: Patchifier, update_mod: Update,
                   steps=18, M=80, mesh=None):
    """Forward-only validation rollout (ref train.py:28-131): encoders +
    full recurrent rollout + BA, NO optimizer update.  Returns
    eval_step(params, batch) -> (est_poses (B, S, N, 7) inverse poses
    per rollout step, metrics)."""

    def sample_eval(params, images, poses, disps, intrinsics, coords,
                    depth_init, sch):
        fmap, gmap, imap, patches_gt, _, _ = patchifier.apply(
            params["patchify"], images, coords, disps=disps)
        fmap4 = corr_ops.avg_pool2d(fmap, 4)
        K = patches_gt.shape[0] * patches_gt.shape[1]
        Pp = patches_gt.shape[-1]
        patches_gt = patches_gt.reshape(K, 3, Pp, Pp)
        gmap = gmap.reshape(K, Pp, Pp, -1)
        imap = imap.reshape(K, -1)
        patches_init = patches_gt.at[:, 2].set(
            jnp.broadcast_to(depth_init[:, None, None], (K, Pp, Pp)))
        out = R.vonet_rollout(
            params["update"], imap, gmap, fmap, fmap4,
            patches_init, patches_gt, poses, intrinsics,
            sch["ii"], sch["jj"], sch["kk"], sch["active"],
            sch["fresh"], sch["intro"],
            update_mod=update_mod, structure_only=False,
            steps=steps, M=M)
        tr, ro, _ = R.pose_loss_terms(out["poses"], poses)
        metrics = {"flow_err": out["flow_err"][-1], "px1": out["px1"][-1],
                   "tr": tr[-1], "ro": ro[-1]}
        return out["poses"], metrics

    def eval_step(params, batch):
        sch = {k[4:]: batch[k] for k in batch if k.startswith("sch_")}
        est, metrics = jax.vmap(
            sample_eval, in_axes=(None, 0, 0, 0, 0, 0, 0, None))(
                params, batch["images"], batch["poses"], batch["disps"],
                batch["intrinsics"], batch["coords"], batch["depth_init"],
                sch)
        return est, jax.tree.map(jnp.mean, metrics)

    return jax.jit(eval_step)
