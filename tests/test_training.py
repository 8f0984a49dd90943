"""Training rollout tests: schedule-driven unroll, gradient flow, losses.

Kept tiny (N=5 frames, M=4 patches, 3 steps) — compiles dominate runtime.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from dpvo_tpu.models.update import Update, DIM
from dpvo_tpu.training import rollout as R
from dpvo_tpu.ops import lie, corr as corr_ops

N, H, W, M, S = 5, 32, 48, 4, 3
h, w = H // 4, W // 4
K = N * M


@pytest.fixture(scope="module")
def setup():
    update_mod = Update(3, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    sch = R.build_schedule(N, M, S, rng)
    u_params = update_mod.init(
        key, jnp.zeros((8, DIM)), jnp.zeros((8, DIM)),
        jnp.zeros((8, 2 * 49 * 9)), jnp.zeros((8,), jnp.int32),
        jnp.zeros((8,), jnp.int32), jnp.zeros((8,), jnp.int32))

    xi = jax.random.normal(key, (N, 6)) * 0.05
    xi = xi.at[:, 0].add(jnp.arange(N) * 0.1)
    poses_gt = lie.se3_inv(lie.se3_exp(xi))

    imap = jnp.asarray(rng.normal(size=(K, DIM)), jnp.float32) * 0.1
    gmap = jnp.asarray(rng.normal(size=(K, 3, 3, 128)), jnp.float32) * 0.1
    fmap1 = jnp.asarray(rng.normal(size=(N, h, w, 128)), jnp.float32) * 0.1
    fmap4 = corr_ops.avg_pool2d(fmap1, 4)
    intr = jnp.tile(jnp.asarray([[40.0, 40.0, w / 2, h / 2]]), (N, 1))

    cx = jnp.asarray(rng.uniform(2, w - 2, (K, 1, 1)), jnp.float32)
    cy = jnp.asarray(rng.uniform(2, h - 2, (K, 1, 1)), jnp.float32)
    off = jnp.arange(3, dtype=jnp.float32) - 1
    d = jnp.asarray(rng.uniform(0.5, 1.5, (K, 1, 1)), jnp.float32)
    patches_gt = jnp.stack([
        jnp.broadcast_to(cx + off[None, None, :], (K, 3, 3)),
        jnp.broadcast_to(cy + off[None, :, None], (K, 3, 3)),
        jnp.broadcast_to(d, (K, 3, 3))], axis=1)
    patches_init = patches_gt.at[:, 2].set(
        jnp.asarray(rng.uniform(0.3, 1.0, (K, 1, 1)), jnp.float32))

    return dict(update_mod=update_mod, u_params=u_params, sch=sch,
                poses_gt=poses_gt, imap=imap, gmap=gmap, fmap1=fmap1,
                fmap4=fmap4, intr=intr, patches_gt=patches_gt,
                patches_init=patches_init)


def _rollout(s, params, structure_only=False):
    sch = s["sch"]
    return R.vonet_rollout(
        params, s["imap"], s["gmap"], s["fmap1"], s["fmap4"],
        s["patches_init"], s["patches_gt"], s["poses_gt"], s["intr"],
        sch.ii, sch.jj, sch.kk, sch.active, sch.fresh, sch.intro,
        update_mod=s["update_mod"], structure_only=structure_only,
        steps=S, M=M)


def test_rollout_outputs(setup):
    out = _rollout(setup, setup["u_params"])
    assert out["flow_err"].shape == (S,)
    assert out["poses"].shape == (S, N, 7)
    assert np.all(np.isfinite(np.asarray(out["flow_err"])))
    assert np.all(np.isfinite(np.asarray(out["poses"])))


def test_rollout_gradients_nonzero(setup):
    def loss(p):
        out = _rollout(setup, p)
        tr, ro, _ = R.pose_loss_terms(out["poses"], setup["poses_gt"])
        mask = jnp.arange(S) >= 2
        return (0.1 * jnp.sum(out["flow_err"])
                + 10.0 * jnp.sum((tr + ro) * mask))

    g = jax.grad(loss)(setup["u_params"])
    gnorm = float(optax.global_norm(g))
    assert np.isfinite(gnorm)
    assert gnorm > 1e-6, "gradients are zero — loss disconnected"


def test_structure_only_keeps_poses(setup):
    out = _rollout(setup, setup["u_params"], structure_only=True)
    # poses pinned to GT for every step
    for s_i in range(S):
        np.testing.assert_allclose(np.asarray(out["poses"][s_i]),
                                   np.asarray(setup["poses_gt"]),
                                   atol=1e-5)


def test_kabsch_umeyama_scale():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(20, 3)), jnp.float32)
    B = A * 0.5
    s = R.kabsch_umeyama(A, B)
    np.testing.assert_allclose(float(s), 2.0, rtol=1e-4)
