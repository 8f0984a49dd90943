"""Training rollout: the VONet recurrent unroll as a `lax.scan`.

Rebuild of the reference's VONet.forward training loop (ref net.py:184-268):
STEPS iterations of [reproject -> correlate -> update -> 2x differentiable
BA], with incremental frame introduction after step 8 and random
frame-edge dropout (p=0.1).

TPU-native restructuring: the reference grows edge lists with torch.cat
mid-rollout; XLA needs static shapes, so the full edge schedule is
precomputed on the host (``build_schedule``) with every edge assigned a
fixed slot for the whole rollout — per-step ``active``/``fresh`` masks
replace list growth/dropout, and the unroll becomes a `lax.scan` with
`jax.checkpoint` per step to bound activation memory across 18 steps.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import projective as pops, corr as corr_ops, ba, lie
from ..models.update import DIM


class Schedule(NamedTuple):
    """Host-precomputed rollout schedule (fixed edge slots)."""
    ii: np.ndarray        # (E,) source frame
    jj: np.ndarray        # (E,) target frame
    kk: np.ndarray        # (E,) patch index
    active: np.ndarray    # (S, E) bool
    fresh: np.ndarray     # (S, E) bool — net row reset at this step
    intro: np.ndarray     # (S,) int — frame introduced at step, or -1


def build_schedule(n_frames, M, steps, rng: np.random.Generator,
                   dropout_p=0.1):
    """Simulates the reference's edge growth exactly (net.py:204-243)."""
    edges = []    # (ii, jj, kk, birth_step)
    dead = {}     # slot -> death step

    def add(kk_arr, jj_arr, step):
        for kkv, jjv in zip(kk_arr, jj_arr):
            edges.append((kkv // M, jjv, kkv, step))

    # initial: patches of frames < 8 into frames 0..7 (net.py:204);
    # clamped for short clips so tiny smoke configs work
    init = min(8, n_frames)
    kk0 = np.arange(init * M)
    add(np.repeat(kk0, init), np.tile(np.arange(init), init * M), 0)

    n = init
    for s in range(steps):
        if s >= 8 and n < n_frames:
            kk1 = np.arange(n * M)                      # patches < n -> n
            add(kk1, np.full(n * M, n), s)
            kk2 = np.arange(n * M, (n + 1) * M)         # patches of n -> 0..n
            add(np.repeat(kk2, n + 1), np.tile(np.arange(n + 1), M), s)
            if rng.random() < dropout_p:
                f = n - 4
                for slot, (ei, ej, ek, b) in enumerate(edges):
                    if (ei == f or ej == f) and slot not in dead and b <= s:
                        dead[slot] = s
            n += 1

    E = len(edges)
    ii = np.array([e[0] for e in edges], np.int32)
    jj = np.array([e[1] for e in edges], np.int32)
    kk = np.array([e[2] for e in edges], np.int32)
    birth = np.array([e[3] for e in edges], np.int32)

    active = np.zeros((steps, E), bool)
    fresh = np.zeros((steps, E), bool)
    intro = np.full((steps,), -1, np.int32)
    nn = init
    for s in range(steps):
        if s >= 8 and nn < n_frames:
            intro[s] = nn
            nn += 1
        alive = (birth <= s)
        for slot, dstep in dead.items():
            if s >= dstep:
                alive[slot] = False
        active[s] = alive
        fresh[s] = birth == s
    return Schedule(ii, jj, kk, active, fresh, intro)


def pad_schedule(sch: Schedule, e_cap: int) -> Schedule:
    E = len(sch.ii)
    assert E <= e_cap, (E, e_cap)
    pad = e_cap - E
    return Schedule(
        np.concatenate([sch.ii, np.zeros(pad, np.int32)]),
        np.concatenate([sch.jj, np.zeros(pad, np.int32)]),
        np.concatenate([sch.kk, np.zeros(pad, np.int32)]),
        np.concatenate([sch.active,
                        np.zeros((sch.active.shape[0], pad), bool)], axis=1),
        np.concatenate([sch.fresh,
                        np.zeros((sch.fresh.shape[0], pad), bool)], axis=1),
        sch.intro)


def _set_depth(patches, mask, value):
    """patches (K, 3, P, P): set depth channel where mask (K,) holds."""
    P = patches.shape[-1]
    d = jnp.where(mask[:, None, None], value, patches[:, 2])
    return patches.at[:, 2].set(d)


@partial(jax.jit,
         static_argnames=("update_mod", "structure_only", "steps", "M"))
def vonet_rollout(params_update, imap, gmap, fmap_pyr1, fmap_pyr4,
                  patches_init, patches_gt, poses_gt, intrinsics,
                  sch_ii, sch_jj, sch_kk, sch_active, sch_fresh, sch_intro,
                  update_mod, structure_only, steps, M):
    """The unrolled training forward (ref net.py:216-268).

    imap    (K, DIM); gmap (K, P, P, 128)
    fmap_pyr1/4 (N, h, w, 128) / (N, h/4, w/4, 128)
    patches_init (K, 3, P, P) — random depth already set (net.py:201-202)
    patches_gt   (K, 3, P, P); poses_gt (N, 7) inverse (world-from-cam)
    intrinsics   (N, 4) feature-res
    Returns per-step loss components: dict with
      flow_err (S,), px1 (S,), tr (S,), ro (S,), poses (S, N, 7).
    """
    N = poses_gt.shape[0]
    K = patches_init.shape[0]
    Ecap = sch_ii.shape[0]
    P = patches_init.shape[-1]
    c = P // 2
    h = fmap_pyr1.shape[1]
    w = fmap_pyr1.shape[2]
    bounds = jnp.array([-64.0, -64.0, w + 64.0, h + 64.0])

    ix = jnp.arange(K) // M                     # patch -> frame

    # GT coords + validity, fixed across steps (net.py:264)
    coords_gt, valid_gt, _ = pops.transform(
        poses_gt, patches_gt, intrinsics, sch_ii, sch_jj, sch_kk,
        jacobian=True)

    Gs0 = jnp.where(structure_only, poses_gt,
                    jnp.broadcast_to(lie.se3_identity(), (N, 7)))

    def step(carry, xs):
        Gs, patches, net = carry
        active, fresh, intro = xs

        Gs = jax.lax.stop_gradient(Gs)
        patches = jax.lax.stop_gradient(patches)

        # frame introduction (net.py:223-243)
        def do_intro(args):
            Gs, patches = args
            prev = Gs[jnp.maximum(intro - 1, 0)]
            Gs2 = jnp.where(structure_only, Gs,
                            Gs.at[intro].set(prev))
            m_new = ix == intro
            m_src = (ix == intro - 1) | (ix == intro - 2)
            dmed = jnp.nan_to_num(
                jnp.nanmedian(jnp.where(m_src[:, None, None],
                                        patches[:, 2], jnp.nan)), nan=1.0)
            patches2 = _set_depth(patches, m_new, dmed)
            return Gs2, patches2

        Gs, patches = jax.lax.cond(intro >= 0, do_intro,
                                   lambda a: a, (Gs, patches))

        net = jnp.where(fresh[:, None], 0.0, net)

        coords = pops.transform(Gs, patches, intrinsics,
                                sch_ii, sch_jj, sch_kk)     # (E, P, P, 2)
        coords2 = coords.transpose(0, 3, 1, 2)

        c1 = corr_ops.corr(gmap, fmap_pyr1, coords2, sch_kk, sch_jj, 3)
        c2 = corr_ops.corr(gmap, fmap_pyr4, coords2 / 4.0, sch_kk,
                           sch_jj, 3)
        corr_feat = jnp.stack([c1, c2], axis=-1).reshape(Ecap, -1)

        ctx = imap[sch_kk].astype(jnp.float32)
        net, delta, weight = update_mod.apply(
            params_update, net, ctx, corr_feat, sch_ii, sch_jj, sch_kk,
            active)

        target = coords[:, c, c] + delta

        for _ in range(2):                                  # net.py:255-257
            Gs, patches = ba.ba_differentiable(
                Gs, patches, intrinsics, target, weight, 1e-4,
                sch_ii, sch_jj, sch_kk, active, bounds, ep=10.0,
                fixedp=1, structure_only=structure_only, k_cap=K)

        # --- per-step loss pieces (train.py:305-339) ---
        dij = jnp.abs(sch_ii - sch_jj)
        lmask = active & (dij > 0) & (dij <= 2)

        coords_post = pops.transform(Gs, patches, intrinsics,
                                     sch_ii, sch_jj, sch_kk)
        diff = coords_post - coords_gt
        # eps-safe norm: the exact-zero diffs of self-pair edges (ii == jj)
        # make jnp.linalg.norm produce NaN cotangents that grad_clip would
        # silently zero for the WHOLE parameter tree
        e = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)   # (E, P, P)
        e = e.reshape(Ecap, P * P)
        vg = (valid_gt > 0.5)
        # min over patch pixels of edges whose center is valid (the
        # reference's v is a per-edge scalar, ref train.py:308)
        e_min = jnp.min(e, axis=-1)
        row = lmask & vg
        flow_err = jnp.sum(jnp.where(row, e_min, 0.0)) \
            / jnp.maximum(jnp.sum(row), 1)
        px1 = jnp.sum(jnp.where(row, (e_min < 0.25), 0.0)) \
            / jnp.maximum(jnp.sum(row), 1)

        return (Gs, patches, net), (flow_err, px1, Gs)

    xs = (jnp.asarray(sch_active), jnp.asarray(sch_fresh),
          jnp.asarray(sch_intro))
    step_ckpt = jax.checkpoint(step)
    (_, _, _), (flow_err, px1, poses_steps) = jax.lax.scan(
        step_ckpt, (Gs0, patches_init, jnp.zeros((Ecap, DIM))), xs,
        length=steps)

    return {"flow_err": flow_err, "px1": px1, "poses": poses_steps}


def pose_loss_terms(poses_steps, poses_gt):
    """Umeyama-scaled relative pose errors per step (train.py:310-337).

    poses_steps (S, N, 7) estimated inverse poses; poses_gt (N, 7).
    Returns (tr (S,), ro (S,), fracs) where fracs holds the reference's
    threshold metrics r1/r2/t1/t2 per step (train.py:353-359: fraction
    of pose pairs with rotation error < 1e-3 / 1e-2 and translation
    error < 1e-3 / 1e-2).
    """
    N = poses_gt.shape[1] if poses_gt.ndim == 3 else poses_gt.shape[0]
    ii, jj = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    k = ii != jj
    ii = jnp.asarray(ii.reshape(-1)[k.reshape(-1)])
    jj = jnp.asarray(jj.reshape(-1)[k.reshape(-1)])

    P2 = lie.se3_inv(poses_gt)          # camera-from-world ("true" poses)
    t2 = P2[:, :3]

    def one(Gs):
        P1 = lie.se3_inv(Gs)
        t1 = P1[:, :3]
        s = kabsch_umeyama(t2, t1)
        s = jax.lax.stop_gradient(jnp.clip(s, a_max=10.0))
        P1s = lie.se3_scale(P1, jnp.broadcast_to(s, (N,)))
        dP = lie.se3_mul(lie.se3_inv(P1s[ii]), P1s[jj])
        dG = lie.se3_mul(lie.se3_inv(P2[ii]), P2[jj])
        e1 = lie.se3_log(lie.se3_mul(dP, lie.se3_inv(dG)))
        # eps-safe norms (exact zeros at identical poses NaN the backward)
        trp = jnp.sqrt(jnp.sum(e1[:, 0:3] ** 2, -1) + 1e-12)
        rop = jnp.sqrt(jnp.sum(e1[:, 3:6] ** 2, -1) + 1e-12)
        fr = {"r1": (rop < 1e-3).mean(), "r2": (rop < 1e-2).mean(),
              "t1": (trp < 1e-3).mean(), "t2": (trp < 1e-2).mean()}
        return trp.mean(), rop.mean(), fr

    return jax.vmap(one)(poses_steps)


def kabsch_umeyama(A, B):
    """Scale-only trajectory alignment (ref utils/utils.py:17-42), fp32."""
    A = jnp.asarray(A, jnp.float32)
    B = jnp.asarray(B, jnp.float32)
    n = A.shape[0]
    EA = A.mean(axis=0)
    EB = B.mean(axis=0)
    VarA = jnp.mean(jnp.sum((A - EA) ** 2, axis=-1))
    H = (A - EA).T @ (B - EB) / n
    D = jnp.linalg.svd(H, compute_uv=False)
    return VarA / jnp.maximum(jnp.sum(D), 1e-8)
