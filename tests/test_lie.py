"""Group-axiom and consistency tests for dpvo_tpu.ops.lie.

Mirrors the reference's lietorch test strategy (run_tests.py: exp/log
round-trip, inv, adjoint identity, act-vs-matrix) plus numerical Jacobian
checks via jax autodiff in float64-free fp32 with loose tolerances.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpvo_tpu.ops import lie


def rand_se3(key, n=32, scale=1.0):
    xi = jax.random.normal(key, (n, 6)) * scale
    return lie.se3_exp(xi)


def rand_sim3(key, n=32, scale=0.5):
    xi = jax.random.normal(key, (n, 7)) * scale
    return lie.sim3_exp(xi)


KEY = jax.random.PRNGKey(0)


class TestSO3:
    def test_exp_log_roundtrip(self):
        phi = jax.random.normal(KEY, (64, 3))
        # log returns the principal value — keep |phi| < pi
        phi = phi / jnp.linalg.norm(phi, axis=-1, keepdims=True).clip(1.0)
        q = lie.so3_exp(phi)
        np.testing.assert_allclose(lie.so3_log(q), phi, atol=1e-5)

    def test_unit_norm(self):
        q = lie.so3_exp(jax.random.normal(KEY, (64, 3)) * 3)
        np.testing.assert_allclose(jnp.linalg.norm(q, axis=-1), 1.0, atol=1e-6)

    def test_inv(self):
        q = lie.so3_exp(jax.random.normal(KEY, (16, 3)))
        qq = lie.so3_mul(q, lie.so3_inv(q))
        np.testing.assert_allclose(
            qq, np.tile([0, 0, 0, 1.0], (16, 1)), atol=1e-6)

    def test_act_matches_matrix(self):
        q = lie.so3_exp(jax.random.normal(KEY, (16, 3)))
        p = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
        R = lie.quat_to_matrix(q)
        np.testing.assert_allclose(
            lie.so3_act(q, p), jnp.einsum("nij,nj->ni", R, p), atol=1e-5)

    def test_small_angle(self):
        phi = jnp.array([[1e-9, 0, 0], [0.0, 0, 0]])
        q = lie.so3_exp(phi)
        assert np.all(np.isfinite(q))
        assert np.all(np.isfinite(lie.so3_log(q)))

    def test_negative_w_log(self):
        # q and -q are the same rotation; log must stay in the principal ball
        phi = jnp.array([[0.1, -0.2, 0.3]])
        q = lie.so3_exp(phi)
        np.testing.assert_allclose(lie.so3_log(-q), phi, atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(KEY, (64, 6))
        # keep the rotation part inside the principal ball
        xi = xi.at[:, 3:].set(
            xi[:, 3:] / jnp.linalg.norm(xi[:, 3:], axis=-1, keepdims=True).clip(1.0))
        g = lie.se3_exp(xi)
        np.testing.assert_allclose(lie.se3_log(g), xi, atol=1e-4)

    def test_identity(self):
        g = lie.se3_identity((5,))
        p = jax.random.normal(KEY, (5, 3))
        np.testing.assert_allclose(lie.se3_act(g, p), p, atol=1e-6)

    def test_inv(self):
        g = rand_se3(KEY)
        gg = lie.se3_mul(g, lie.se3_inv(g))
        np.testing.assert_allclose(gg, lie.se3_identity((32,)), atol=1e-5)

    def test_associativity(self):
        k1, k2, k3 = jax.random.split(KEY, 3)
        a, b, c = rand_se3(k1), rand_se3(k2), rand_se3(k3)
        lhs = lie.se3_mul(lie.se3_mul(a, b), c)
        rhs = lie.se3_mul(a, lie.se3_mul(b, c))
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_act_matches_matrix(self):
        g = rand_se3(KEY, 16)
        p = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
        M = lie.se3_matrix(g)
        ph = jnp.concatenate([p, jnp.ones((16, 1))], axis=-1)
        np.testing.assert_allclose(
            lie.se3_act(g, p), jnp.einsum("nij,nj->ni", M, ph)[..., :3],
            atol=1e-5)

    def test_act4_scaling(self):
        # act4([p*d, d]) == d * act([p]) in homogeneous coords
        g = rand_se3(KEY, 8)
        p = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
        d = jax.random.uniform(jax.random.PRNGKey(3), (8, 1), minval=0.2)
        p4 = jnp.concatenate([p * d, d], axis=-1)
        out = lie.se3_act4(g, p4)
        np.testing.assert_allclose(out[..., :3] / out[..., 3:],
                                   lie.se3_act(g, p), atol=1e-4)

    def test_adjoint_identity(self):
        # Adj(g) xi == log(g * exp(xi) * g^-1) for small xi
        g = rand_se3(KEY, 8)
        xi = jax.random.normal(jax.random.PRNGKey(4), (8, 6)) * 1e-3
        lhs = lie.se3_adj(g, xi)
        rhs = lie.se3_log(
            lie.se3_mul(g, lie.se3_mul(lie.se3_exp(xi), lie.se3_inv(g))))
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_adjT_is_transpose(self):
        g = rand_se3(KEY, 8)
        a = jax.random.normal(jax.random.PRNGKey(5), (8, 6))
        b = jax.random.normal(jax.random.PRNGKey(6), (8, 6))
        # <a, Adj b> == <AdjT a, b>
        lhs = jnp.sum(a * lie.se3_adj(g, b), axis=-1)
        rhs = jnp.sum(lie.se3_adjT(g, a) * b, axis=-1)
        np.testing.assert_allclose(lhs, rhs, atol=1e-4)

    def test_retr_zero(self):
        g = rand_se3(KEY, 8)
        np.testing.assert_allclose(
            lie.se3_retr(g, jnp.zeros((8, 6))), g, atol=1e-6)

    def test_grad_finite(self):
        # autodiff through exp/log/act must produce finite grads at 0
        def f(xi):
            g = lie.se3_exp(xi)
            return jnp.sum(lie.se3_act(g, jnp.ones(3)) ** 2)
        for x0 in [jnp.zeros(6), jnp.ones(6) * 0.5]:
            gr = jax.grad(f)(x0)
            assert np.all(np.isfinite(gr))

    def test_scale(self):
        g = rand_se3(KEY, 4)
        g2 = lie.se3_scale(g, jnp.full((4,), 2.0))
        np.testing.assert_allclose(g2[..., :3], 2 * g[..., :3], atol=1e-6)
        np.testing.assert_allclose(g2[..., 3:], g[..., 3:], atol=1e-6)


class TestRxSO3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(KEY, (32, 4)) * 0.5
        g = lie.rxso3_exp(xi)
        # 2e-4: TPU f32 transcendentals (sin/atan2) are a little less
        # accurate than CPU libm; the math is the robust atan2 form
        np.testing.assert_allclose(lie.rxso3_log(g), xi, atol=2e-4)

    def test_act(self):
        xi = jnp.array([[0.0, 0, 0, jnp.log(2.0)]])
        g = lie.rxso3_exp(xi)
        p = jnp.array([[1.0, 2, 3]])
        np.testing.assert_allclose(lie.rxso3_act(g, p), 2 * p, atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(KEY, (64, 7)) * 0.5
        g = lie.sim3_exp(xi)
        np.testing.assert_allclose(lie.sim3_log(g), xi, atol=1e-3)

    def test_inv(self):
        g = rand_sim3(KEY)
        gg = lie.sim3_mul(g, lie.sim3_inv(g))
        np.testing.assert_allclose(gg, lie.sim3_identity((32,)), atol=1e-5)

    def test_act_matches_matrix(self):
        g = rand_sim3(KEY, 16)
        p = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
        M = lie.sim3_matrix(g)
        ph = jnp.concatenate([p, jnp.ones((16, 1))], axis=-1)
        np.testing.assert_allclose(
            lie.sim3_act(g, p), jnp.einsum("nij,nj->ni", M, ph)[..., :3],
            atol=1e-4)

    def test_adjoint_identity(self):
        g = rand_sim3(KEY, 8)
        xi = jax.random.normal(jax.random.PRNGKey(4), (8, 7)) * 1e-3
        Adj = lie.sim3_adj_matrix(g)
        lhs = jnp.einsum("nij,nj->ni", Adj, xi)
        rhs = lie.sim3_log(
            lie.sim3_mul(g, lie.sim3_mul(lie.sim3_exp(xi), lie.sim3_inv(g))))
        np.testing.assert_allclose(lhs, rhs, atol=2e-4)

    def test_se3_embedding(self):
        g = rand_se3(KEY, 8)
        s = lie.se3_to_sim3(g)
        p = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
        np.testing.assert_allclose(
            lie.sim3_act(s, p), lie.se3_act(g, p), atol=1e-5)


def test_jit_compatible():
    f = jax.jit(lambda xi: lie.se3_log(lie.se3_mul(
        lie.se3_exp(xi), lie.se3_inv(lie.se3_exp(xi)))))
    out = f(jnp.ones((4, 6)))
    np.testing.assert_allclose(out, np.zeros((4, 6)), atol=1e-5)


def test_vmap_compatible():
    xi = jax.random.normal(KEY, (3, 5, 6))
    out = jax.vmap(lie.se3_exp)(xi)
    assert out.shape == (3, 5, 7)
