"""Edge-sharded inference vs single-device at RETAIN SCALE (32k edges).

The regular suite exercises the sharded update at E_pad=512
(tests/test_infer_sharded.py); this test runs the same comparison at
the retain-regime bucket the sharding exists for — 32768 edge rows over
a 22-frame patch window with M=96 patches/frame — on the 8-virtual-CPU
mesh.  The XLA-gather corr path at this scale moves ~19 GB per update
on a 1-core CPU VM, so the test is gated:

    DPVO_RETAIN_SHARDED=1 python -m pytest tests/test_infer_sharded_retain.py -v -s

Recorded result (docs/MULTICHIP.md "retain-scale sharded check"):
max pose diff, max depth diff, max |delta| diff between the 8-shard and
single-device runs.
"""
from __future__ import annotations

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

if not os.environ.get("DPVO_RETAIN_SHARDED"):
    pytest.skip("retain-scale sharded check is gated behind "
                "DPVO_RETAIN_SHARDED=1 (moves ~19 GB through the CPU "
                "gather path)", allow_module_level=True)

from dpvo_tpu.models.update import Update, DIM
from dpvo_tpu.engine import kernels
from dpvo_tpu.parallel.mesh import make_mesh
from dpvo_tpu.parallel.infer_step import (make_sharded_update_step,
                                          shard_edges_by_patch)

NDEV = 8
M, P = 96, 3
PMEM = MEM = 36
H, W = 24, 32
N_FRAMES = 48
N_CAP, K_CAP = 16, 4096
E_LIVE = 32000
E_PAD = 32768
WINDOW = 22


def test_sharded_update_matches_single_device_retain_scale():
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

    n_now = 44
    kk = np.sort(rng.integers((n_now - WINDOW) * M, n_now * M, E_LIVE)
                 ).astype(np.int32)
    ii = (kk // M).astype(np.int32)
    jj = np.minimum(ii + rng.integers(1, 12, E_LIVE), n_now - 1).astype(
        np.int32)
    net = rng.normal(size=(E_LIVE, DIM)).astype(np.float32) * 0.1
    target = rng.uniform(0, 24, (E_LIVE, 2)).astype(np.float32)
    weight = rng.uniform(0, 1, (E_LIVE, 2)).astype(np.float32)
    t0, t1 = n_now - 10, n_now

    # --- single-device reference ----------------------------------------
    pad = E_PAD - E_LIVE

    def pad0(x):
        return np.concatenate(
            [x, np.zeros((pad,) + x.shape[1:], x.dtype)])

    valid1 = np.arange(E_PAD) < E_LIVE
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
    net1, target1, weight1, delta1, poses1, patches1, _ = map(
        np.asarray, out1[:7])

    # --- 8-shard run -----------------------------------------------------
    mesh = make_mesh(NDEV, axis_name="edges")
    step = make_sharded_update_step(
        update_mod, mesh, M=M, pmem=PMEM, mem=MEM, n_cap=N_CAP,
        k_cap=K_CAP, span=N_FRAMES, iterations=2)

    perm, valid_s = shard_edges_by_patch(ii, jj, kk, NDEV, k_cap=K_CAP)
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

    d_pose = np.abs(poses2 - poses1).max()
    d_depth = np.abs(patches2[:, 2] - patches1[:, 2]).max()

    inv = np.full(E_LIVE, -1, np.int64)
    rows = np.nonzero(valid_s)[0]
    inv[perm[rows]] = rows
    assert (inv >= 0).all()
    d_delta = np.abs(delta2[inv] - delta1[:E_LIVE]).max()
    d_net = np.abs(net2[inv] - net1[:E_LIVE]).max()

    print(f"\nretain-scale sharded vs single: max pose diff {d_pose:.3e}"
          f", max depth diff {d_depth:.3e}, max delta diff {d_delta:.3e}"
          f", max net diff {d_net:.3e}")

    np.testing.assert_allclose(poses2, poses1, atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(delta2[inv], delta1[:E_LIVE],
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(net2[inv], net1[:E_LIVE],
                               atol=2e-3, rtol=2e-3)
    # depths: the psum reduction order can flip a HARD threshold (robust
    # mask, depth reset) on a razor-edge patch, diverging that single
    # patch's depth (recorded run: 1 of 4608, with the matching edge
    # weights near zero).  Require all but <=0.1% of patch depths tight;
    # the CUDA reference has the same property across its atomicAdd
    # orders (ba_cuda.cu:335-373).
    dd = np.abs(patches2[:, 2] - patches1[:, 2]).max(axis=(1, 2))
    n_out = int((dd > 5e-3).sum())
    assert n_out <= max(1, len(dd) // 1000), (n_out, dd.max())
    tight = dd <= 5e-3
    np.testing.assert_allclose(patches2[tight, 2], patches1[tight, 2],
                               atol=5e-3, rtol=1e-3)
    print(f"depth outliers (threshold-crossing): {n_out}/{len(dd)}")
