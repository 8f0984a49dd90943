"""Tests for dpvo_tpu.ops.projective: golden values, round-trips, and
analytic-Jacobian checks against jax autodiff."""
import numpy as np
import jax
import jax.numpy as jnp

from dpvo_tpu.ops import lie, projective as pops


def make_scene(key, n_frames=4, n_patches=8, P=3):
    """Random but well-conditioned scene."""
    k1, k2, k3 = jax.random.split(key, 3)
    xi = jax.random.normal(k1, (n_frames, 6)) * 0.1
    poses = lie.se3_exp(xi)
    # patch centers in a 120x160 feature image, depths ~ U[0.5, 2]
    cx = jax.random.uniform(k2, (n_patches, 1, 1), minval=20, maxval=140)
    cy = jax.random.uniform(k3, (n_patches, 1, 1), minval=15, maxval=105)
    d = jax.random.uniform(k1, (n_patches, 1, 1), minval=0.5, maxval=2.0)
    off = jnp.arange(P, dtype=jnp.float32) - P // 2
    px = cx + off[None, None, :]
    py = cy + off[None, :, None]
    patches = jnp.stack([jnp.broadcast_to(px, (n_patches, P, P)),
                         jnp.broadcast_to(py, (n_patches, P, P)),
                         jnp.broadcast_to(d, (n_patches, P, P))], axis=1)
    intrinsics = jnp.tile(jnp.array([[80.0, 80.0, 80.0, 60.0]]), (n_frames, 1))
    return poses, patches, intrinsics


KEY = jax.random.PRNGKey(7)


def test_identity_transform_is_noop():
    poses = lie.se3_identity((3,))
    _, patches, intrinsics = make_scene(KEY, 3, 5)
    ii = jnp.array([0, 1, 2, 0, 1])
    kk = jnp.arange(5)
    coords = pops.transform(poses, patches, intrinsics, ii, ii, kk)
    # reprojecting into the same frame with identity poses returns the
    # original patch pixel coordinates
    np.testing.assert_allclose(coords[..., 0], patches[kk, 0], atol=1e-4)
    np.testing.assert_allclose(coords[..., 1], patches[kk, 1], atol=1e-4)


def test_iproj_proj_roundtrip():
    _, patches, intrinsics = make_scene(KEY, 2, 6)
    ii = jnp.zeros(6, dtype=jnp.int32)
    X = pops.iproj(patches, intrinsics[ii])
    # scale to metric: X/d gives the 3D point; project it back
    Xm = jnp.concatenate([X[..., :3] / X[..., 3:], jnp.ones_like(X[..., :1])],
                         axis=-1)
    xy = pops.proj(Xm, intrinsics[ii])
    np.testing.assert_allclose(xy[..., 0], patches[:, 0], atol=1e-3)
    np.testing.assert_allclose(xy[..., 1], patches[:, 1], atol=1e-3)


def test_transform_matches_manual():
    poses, patches, intrinsics = make_scene(KEY, 4, 8)
    ii = jnp.array([0, 1, 2])
    jj = jnp.array([1, 2, 3])
    kk = jnp.array([0, 3, 6])
    coords = pops.transform(poses, patches, intrinsics, ii, jj, kk)

    # manual: lift center pixel, apply relative pose, project
    for e in range(3):
        i, j, k = int(ii[e]), int(jj[e]), int(kk[e])
        fx, fy, cx, cy = np.asarray(intrinsics[i])
        x, y, d = [float(patches[k, c, 1, 1]) for c in range(3)]
        Xh = np.array([(x - cx) / fx, (y - cy) / fy, 1.0, d])
        Gij = lie.se3_mul(poses[j], lie.se3_inv(poses[i]))
        X1 = np.asarray(lie.se3_act4(Gij, jnp.array(Xh)))
        u = fx * X1[0] / max(X1[2], 0.1) + cx
        v = fy * X1[1] / max(X1[2], 0.1) + cy
        np.testing.assert_allclose(coords[e, 1, 1, 0], u, atol=1e-2)
        np.testing.assert_allclose(coords[e, 1, 1, 1], v, atol=1e-2)


def test_jacobians_match_autodiff():
    poses, patches, intrinsics = make_scene(KEY, 4, 8)
    ii = jnp.array([0, 1])
    jj = jnp.array([1, 3])
    kk = jnp.array([2, 5])

    _, v, (Ji, Jj, Jz) = pops.transform(
        poses, patches, intrinsics, ii, jj, kk, jacobian=True)
    assert np.all(np.asarray(v) == 1.0)

    # autodiff wrt a right-perturbation xi on pose j: G_j <- exp(xi) G_j
    def center(eps_i, eps_j, dz, e):
        p = poses
        p = p.at[ii[e]].set(lie.se3_retr(p[ii[e]], eps_i))
        p = p.at[jj[e]].set(lie.se3_retr(p[jj[e]], eps_j))
        pt = patches.at[kk[e], 2].add(dz)
        c = pops.transform(p, pt, intrinsics, ii, jj, kk)
        return c[e, 1, 1]

    for e in range(2):
        Jj_num = jax.jacfwd(lambda s: center(jnp.zeros(6), s, 0.0, e))(
            jnp.zeros(6))
        Ji_num = jax.jacfwd(lambda s: center(s, jnp.zeros(6), 0.0, e))(
            jnp.zeros(6))
        Jz_num = jax.jacfwd(lambda s: center(jnp.zeros(6), jnp.zeros(6),
                                             s, e))(0.0)
        np.testing.assert_allclose(Jj[e], Jj_num, atol=2e-2, rtol=1e-3)
        np.testing.assert_allclose(Ji[e], Ji_num, atol=2e-2, rtol=1e-3)
        np.testing.assert_allclose(Jz[e][:, 0], Jz_num, atol=2e-2, rtol=1e-3)


def test_flow_mag_zero_for_identity():
    poses = lie.se3_identity((4,))
    _, patches, intrinsics = make_scene(KEY, 4, 8)
    ii = jnp.array([0, 1])
    jj = jnp.array([1, 2])
    kk = jnp.array([0, 4])
    mag, val = pops.flow_mag(poses, patches, intrinsics, ii, jj, kk, beta=0.5)
    np.testing.assert_allclose(mag, 0.0, atol=1e-3)
    assert np.all(np.asarray(val))


def test_point_cloud_shape():
    poses, patches, intrinsics = make_scene(KEY, 4, 8)
    ix = jnp.array([0, 0, 1, 1, 2, 2, 3, 3])
    pts = pops.point_cloud(poses, patches, intrinsics, ix)
    assert pts.shape == (8, 3, 3, 4)
    assert np.all(np.isfinite(np.asarray(pts)))


def test_induced_flow_translation():
    # camera translating right -> points flow left (negative x flow)
    n, H, W = 2, 24, 32
    poses = lie.se3_identity((n,))
    poses = poses.at[1, 0].set(-0.5)  # world-from-cam1: shift
    disps = jnp.full((n, H, W), 1.0)
    intr = jnp.tile(jnp.array([[30.0, 30.0, 16.0, 12.0]]), (n, 1))
    flow, valid = pops.induced_flow(
        poses, disps, intr, jnp.array([0]), jnp.array([1]))
    assert flow.shape == (1, H, W, 2)
    assert np.all(np.asarray(valid) > 0)
    # uniform translation of the camera along +x in cam frame moves
    # projections by -fx * tx * d = -30 * 0.5 = -15 ... sign depends on
    # convention; just check it is uniform and nonzero
    fx_flow = np.asarray(flow[0, :, :, 0])
    assert abs(fx_flow.mean()) > 1.0
    np.testing.assert_allclose(fx_flow, fx_flow.mean(), atol=1e-3)
