"""Edge-sharded inference vs the single-device update step.

Runs one full tracking update (reproject -> two-level correlation ->
recurrent update with cross-shard frame-pair attention -> sharded BA)
over the 8-virtual-device CPU mesh (conftest) and checks every output
against ``kernels.update_step`` on one device with the same inputs.

The sharded path changes only REDUCTION STRUCTURE (psum of per-shard
partials; dense global patch/pair slots instead of sorted compaction),
so outputs must agree to fp32 accumulation tolerance.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpvo_tpu.models.update import Update, DIM
from dpvo_tpu.engine import kernels
from dpvo_tpu.parallel.mesh import make_mesh
from dpvo_tpu.parallel.infer_step import (make_sharded_update_step,
                                          shard_edges_by_patch)

NDEV = 8
M, P = 4, 3
PMEM = MEM = 8
H, W = 24, 32
N_FRAMES = 16
N_CAP, K_CAP = 8, 64
E_LIVE = 300


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < NDEV:
        pytest.skip("needs 8 devices")
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    update_mod = Update(P, dtype=jnp.float32)
    params = update_mod.init(
        key, jnp.zeros((8, DIM)), jnp.zeros((8, DIM)),
        jnp.zeros((8, 2 * 49 * P * P)), jnp.zeros((8,), jnp.int32),
        jnp.zeros((8,), jnp.int32), jnp.zeros((8,), jnp.int32))

    poses = np.zeros((N_FRAMES, 7), np.float32)
    poses[:, 6] = 1.0
    poses[:, 0] = 0.05 * np.arange(N_FRAMES)
    patches = rng.uniform(2.0, 20.0,
                          (N_FRAMES * M, 3, P, P)).astype(np.float32)
    patches[:, 2] = rng.uniform(0.3, 2.0, (N_FRAMES * M, 1, 1))
    intrinsics = np.tile(np.array([[24., 24., 16., 12.]], np.float32),
                         (N_FRAMES, 1))
    imap = rng.normal(size=(PMEM * M, DIM)).astype(np.float32)
    gmap = rng.normal(size=(PMEM * M, P, P, 128)).astype(np.float32)
    fmap1 = rng.normal(size=(MEM, H, W, 128)).astype(np.float32)
    fmap2 = rng.normal(size=(MEM, H // 4, W // 4, 128)).astype(np.float32)

    # live edges over a ~6-frame window ending at frame 12
    n_now = 12
    kk = np.sort(rng.integers((n_now - 6) * M, n_now * M, E_LIVE)
                 ).astype(np.int32)
    ii = (kk // M).astype(np.int32)
    jj = np.minimum(ii + rng.integers(1, 5, E_LIVE), n_now - 1).astype(
        np.int32)
    net = rng.normal(size=(E_LIVE, DIM)).astype(np.float32) * 0.1
    target = rng.uniform(0, 24, (E_LIVE, 2)).astype(np.float32)
    weight = rng.uniform(0, 1, (E_LIVE, 2)).astype(np.float32)

    return (update_mod, params, poses, patches, intrinsics, imap, gmap,
            fmap1, fmap2, net, target, weight, ii, jj, kk, n_now)


def test_sharded_update_matches_single_device(setup):
    (update_mod, params, poses, patches, intrinsics, imap, gmap,
     fmap1, fmap2, net, target, weight, ii, jj, kk, n_now) = setup
    t0, t1 = n_now - 5, n_now

    # --- single-device reference ----------------------------------------
    E_pad = 512
    pad = E_pad - E_LIVE

    def pad0(x, w=0):
        return np.concatenate(
            [x, np.full((pad,) + x.shape[1:], w, x.dtype)])

    valid1 = np.arange(E_pad) < E_LIVE
    out1 = kernels.update_step(
        params, jnp.asarray(poses), jnp.asarray(patches),
        jnp.asarray(intrinsics), jnp.asarray(imap), jnp.asarray(gmap),
        jnp.asarray(fmap1), jnp.asarray(fmap2),
        jnp.asarray(pad0(net)), jnp.asarray(pad0(target)),
        jnp.asarray(pad0(weight)), jnp.asarray(pad0(ii)),
        jnp.asarray(pad0(jj)), jnp.asarray(pad0(kk)),
        jnp.asarray(valid1), jnp.int32(t0), jnp.int32(t1),
        update_mod=update_mod, M=M, pmem=PMEM, mem=MEM,
        n_cap=N_CAP, k_cap=K_CAP, iterations=2, run_ba=True)
    net1, target1, weight1, delta1, poses1, patches1, _ = out1

    # --- sharded ---------------------------------------------------------
    mesh = make_mesh(NDEV, axis_name="edges")
    step = make_sharded_update_step(
        update_mod, mesh, M=M, pmem=PMEM, mem=MEM, n_cap=N_CAP,
        k_cap=K_CAP, span=16, iterations=2)

    perm, valid_s = shard_edges_by_patch(ii, jj, kk, NDEV,
                                         k_cap=K_CAP)
    outs = step(
        params, jnp.asarray(poses), jnp.asarray(patches),
        jnp.asarray(intrinsics), jnp.asarray(imap), jnp.asarray(gmap),
        jnp.asarray(fmap1), jnp.asarray(fmap2),
        jnp.asarray(net[perm]), jnp.asarray(target[perm]),
        jnp.asarray(weight[perm]), jnp.asarray(ii[perm]),
        jnp.asarray(jj[perm]), jnp.asarray(kk[perm]),
        jnp.asarray(valid_s), jnp.int32(t0), jnp.int32(t1))
    net2, target2, weight2, delta2, poses2, patches2 = map(np.asarray,
                                                           outs)

    # poses/patches are replicated outputs — must match the 1-device run
    # atol covers f32 accumulation-order differences between the
    # sharded psum partials and the single-device einsums (the BA
    # center-table change permutes the contraction order slightly)
    np.testing.assert_allclose(poses2, np.asarray(poses1),
                               atol=1e-4, rtol=2e-4)
    # depths are ~O(10); psum reduction order perturbs the last ~3 ulps
    np.testing.assert_allclose(patches2, np.asarray(patches1),
                               atol=2e-3, rtol=5e-4)

    # per-edge outputs: map sharded rows back to original edge order
    inv = np.full(E_LIVE, -1, np.int64)
    rows = np.nonzero(valid_s)[0]
    inv[perm[rows]] = rows
    assert (inv >= 0).all()

    np.testing.assert_allclose(net2[inv], np.asarray(net1)[:E_LIVE],
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(delta2[inv],
                               np.asarray(delta1)[:E_LIVE],
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(weight2[inv],
                               np.asarray(weight1)[:E_LIVE],
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(target2[inv],
                               np.asarray(target1)[:E_LIVE],
                               atol=5e-3, rtol=1e-3)


def test_shard_edges_by_patch_invariants():
    rng = np.random.default_rng(1)
    kk = np.sort(rng.integers(0, 60, 500)).astype(np.int32)
    ii = kk // 4
    jj = ii + 1
    perm, valid = shard_edges_by_patch(ii, jj, kk, 8)
    e_shard = len(perm) // 8
    assert len(perm) % 8 == 0
    # every input edge appears exactly once among valid rows
    assert sorted(perm[valid].tolist()) == list(range(500))
    # no patch group spans two shards
    shard_of = {}
    for r in np.nonzero(valid)[0]:
        s = r // e_shard
        k = int(kk[perm[r]])
        assert shard_of.setdefault(k, s) == s, (
            f"patch {k} split across shards")
