"""Tests for scatter/segment ops and patchify/correlation vs naive refs."""
import numpy as np
import jax
import jax.numpy as jnp

from dpvo_tpu.ops import scatter, corr as corr_ops

KEY = jax.random.PRNGKey(3)


class TestScatter:
    def test_scatter_sum(self):
        src = jnp.arange(12.0).reshape(6, 2)
        idx = jnp.array([0, 0, 1, 2, 2, 2])
        out = scatter.scatter_sum(src, idx, 4)
        expect = np.zeros((4, 2))
        for i, j in enumerate([0, 0, 1, 2, 2, 2]):
            expect[j] += np.arange(12).reshape(6, 2)[i]
        np.testing.assert_allclose(out, expect)

    def test_scatter_softmax_matches_dense(self):
        src = jax.random.normal(KEY, (20, 5))
        idx = jax.random.randint(jax.random.PRNGKey(1), (20,), 0, 4)
        out = scatter.scatter_softmax(src, idx, 4)
        out = np.asarray(out)
        for g in range(4):
            m = np.asarray(idx) == g
            if m.sum() == 0:
                continue
            expect = jax.nn.softmax(src[m], axis=0)
            np.testing.assert_allclose(out[m], expect, atol=1e-6)

    def test_scatter_softmax_sums_to_one(self):
        src = jax.random.normal(KEY, (50, 3)) * 10
        idx = jax.random.randint(jax.random.PRNGKey(2), (50,), 0, 7)
        out = scatter.scatter_softmax(src, idx, 7)
        sums = scatter.scatter_sum(out, idx, 7)
        present = np.unique(np.asarray(idx))
        np.testing.assert_allclose(np.asarray(sums)[present], 1.0, atol=1e-5)

    def test_scatter_mean_empty_segment(self):
        src = jnp.ones((3, 2))
        idx = jnp.array([0, 0, 2])
        out = scatter.scatter_mean(src, idx, 4)
        np.testing.assert_allclose(out[1], 0.0)
        np.testing.assert_allclose(out[0], 1.0)

    def test_compactify(self):
        ix = jnp.array([7, 3, 7, 9, 3, 3])
        kx, ku = scatter.compactify(ix, size=4)
        np.testing.assert_array_equal(np.asarray(kx)[:3], [3, 7, 9])
        np.testing.assert_array_equal(np.asarray(kx[ku]), np.asarray(ix))


def naive_patchify(net, coords, radius):
    """Literal translation of the CUDA patchify + host bilinear blend.
    Takes NHWC input, computes in NCHW internally, returns NMDDC."""
    net = np.asarray(net).transpose(0, 3, 1, 2)
    N, C, H, W = net.shape
    M = coords.shape[1]
    R, D = radius, 2 * radius + 2
    net = np.asarray(net, dtype=np.float64)
    coords = np.asarray(coords, dtype=np.float64)
    raw = np.zeros((N, M, C, D, D))
    for n in range(N):
        for m in range(M):
            x, y = coords[n, m]
            bi, bj = int(np.floor(y)), int(np.floor(x))
            for ii in range(D):
                for jj in range(D):
                    i, j = bi + ii - R, bj + jj - R
                    if 0 <= i < H and 0 <= j < W:
                        raw[n, m, :, ii, jj] = net[n, :, i, j]
    dx = (coords[..., 0] - np.floor(coords[..., 0]))[..., None, None, None]
    dy = (coords[..., 1] - np.floor(coords[..., 1]))[..., None, None, None]
    d = 2 * radius + 1
    out = ((1 - dy) * (1 - dx) * raw[..., :d, :d]
           + (1 - dy) * dx * raw[..., :d, 1:]
           + dy * (1 - dx) * raw[..., 1:, :d]
           + dy * dx * raw[..., 1:, 1:])
    return out.transpose(0, 1, 3, 4, 2)   # -> (N, M, d, d, C)


def naive_corr(gmap, fmap, coords, kidx, fidx, radius):
    """Literal translation of corr_forward_kernel + host blend + permute."""
    E, _, P, _ = coords.shape
    gmap = np.asarray(gmap, np.float64).transpose(0, 3, 1, 2)
    fmap = np.asarray(fmap, np.float64).transpose(0, 3, 1, 2)
    K, C, _, _ = gmap.shape
    F, _, H, W = fmap.shape
    R, D = radius, 2 * radius + 2
    coords = np.asarray(coords, np.float64)
    vol = np.zeros((E, D, D, P, P))
    for e in range(E):
        for py in range(P):
            for px in range(P):
                x, y = coords[e, 0, py, px], coords[e, 1, py, px]
                bi, bj = int(np.floor(y)), int(np.floor(x))
                for ii in range(D):
                    for jj in range(D):
                        i1, j1 = bi + ii - R, bj + jj - R
                        if 0 <= i1 < H and 0 <= j1 < W:
                            vol[e, ii, jj, py, px] = np.dot(
                                gmap[kidx[e], :, py, px],
                                fmap[fidx[e], :, i1, j1])
    dx = (coords[:, 0] - np.floor(coords[:, 0]))[:, None, None]  # (E,1,1,P,P)
    dy = (coords[:, 1] - np.floor(coords[:, 1]))[:, None, None]
    out = ((1 - dx) * (1 - dy) * vol[:, :-1, :-1]
           + dx * (1 - dy) * vol[:, :-1, 1:]
           + (1 - dx) * dy * vol[:, 1:, :-1]
           + dx * dy * vol[:, 1:, 1:])
    # host permute {0,1,3,2,4,5} swaps the two window axes -> [x_off, y_off]
    return out.transpose(0, 2, 1, 3, 4)


class TestPatchify:
    def test_matches_naive(self):
        k1, k2 = jax.random.split(KEY)
        net = jax.random.normal(k1, (2, 20, 24, 8))
        coords = jax.random.uniform(k2, (2, 5, 2), minval=2.0, maxval=17.0)
        for R in (0, 1):
            out = corr_ops.patchify(net, coords, R)
            ref = naive_patchify(net, coords, R)
            assert out.shape == (2, 5, 2 * R + 1, 2 * R + 1, 8)
            np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)

    def test_integer_coords_exact(self):
        net = jax.random.normal(KEY, (1, 16, 16, 4))
        coords = jnp.array([[[5.0, 7.0], [3.0, 2.0]]])
        out = corr_ops.patchify(net, coords, 0)
        np.testing.assert_allclose(out[0, 0, 0, 0, :], net[0, 7, 5, :],
                                   atol=1e-6)
        np.testing.assert_allclose(out[0, 1, 0, 0, :], net[0, 2, 3, :],
                                   atol=1e-6)

    def test_out_of_bounds_zero(self):
        net = jnp.ones((1, 8, 8, 2))
        coords = jnp.array([[[-5.0, -5.0]]])
        out = corr_ops.patchify(net, coords, 1)
        np.testing.assert_allclose(out, 0.0)


class TestCorr:
    def test_matches_naive(self):
        k1, k2, k3 = jax.random.split(KEY, 3)
        K_, C, P = 6, 16, 3
        F, H, W = 3, 20, 24
        E = 10
        gmap = jax.random.normal(k1, (K_, P, P, C))
        fmap = jax.random.normal(k2, (F, H, W, C))
        coords = jax.random.uniform(k3, (E, 2, P, P), minval=4.0,
                                    maxval=15.0)
        kidx = jax.random.randint(k1, (E,), 0, K_)
        fidx = jax.random.randint(k2, (E,), 0, F)
        out = corr_ops.corr(gmap, fmap, coords, kidx, fidx, radius=3)
        ref = naive_corr(gmap, fmap, coords, kidx, fidx, 3)
        assert out.shape == (E, 7, 7, P, P)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3)

    def test_bf16_close_to_fp32(self):
        """Mirrors the reference's fp16-vs-fp32 <1% gate
        (correlation_test.py:245-253)."""
        k1, k2, k3 = jax.random.split(KEY, 3)
        gmap = jax.random.normal(k1, (4, 3, 3, 32))
        fmap = jax.random.normal(k2, (2, 16, 20, 32))
        coords = jax.random.uniform(k3, (8, 2, 3, 3), minval=3, maxval=12)
        kidx = jnp.arange(8) % 4
        fidx = jnp.arange(8) % 2
        out32 = corr_ops.corr(gmap, fmap, coords, kidx, fidx, radius=3)
        out16 = corr_ops.corr(gmap.astype(jnp.bfloat16),
                              fmap.astype(jnp.bfloat16),
                              coords, kidx, fidx, radius=3)
        denom = np.abs(np.asarray(out32)).mean()
        rel = np.abs(np.asarray(out16, np.float32)
                     - np.asarray(out32)).mean() / denom
        assert rel < 0.05

    def test_grad_flows(self):
        k1, k2, k3 = jax.random.split(KEY, 3)
        gmap = jax.random.normal(k1, (2, 3, 3, 8))
        fmap = jax.random.normal(k2, (1, 12, 12, 8))
        coords = jax.random.uniform(k3, (3, 2, 3, 3), minval=3, maxval=8)
        kidx = jnp.array([0, 1, 0])
        fidx = jnp.zeros(3, dtype=jnp.int32)

        def loss(g, f):
            return jnp.sum(corr_ops.corr(g, f, coords, kidx, fidx, 3) ** 2)

        dg, df = jax.grad(loss, argnums=(0, 1))(gmap, fmap)
        assert np.all(np.isfinite(dg)) and np.all(np.isfinite(df))
        assert np.abs(np.asarray(df)).sum() > 0


def test_avg_pool2d():
    x = jnp.arange(32.0).reshape(1, 4, 4, 2)
    out = corr_ops.avg_pool2d(x, 2)
    assert out.shape == (1, 2, 2, 2)
    # channel 0 top-left block: values at (0,0),(0,1),(1,0),(1,1) ch0
    np.testing.assert_allclose(out[0, 0, 0, 0], np.mean([0, 2, 8, 10]))
