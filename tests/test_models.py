"""Tests for model components: shapes, masking, grad surgery, neighbors."""
import numpy as np
import jax
import jax.numpy as jnp

from dpvo_tpu.models import (BasicEncoder4, Update, VONet, Patchifier,
                             GatedResidual, SoftAgg, grad_clip,
                             normalize_images, select_centroids, DIM)
from dpvo_tpu.ops import graph

KEY = jax.random.PRNGKey(0)


def test_neighbors_matches_reference_semantics():
    # edges: kk groups {5: jj=[2,4,3]}, {9: jj=[1]}
    kk = jnp.array([5, 5, 9, 5])
    jj = jnp.array([2, 4, 1, 3])
    ix, jx = graph.neighbors(kk, jj)
    # group kk=5 sorted by jj: edge0 (jj2) -> edge3 (jj3) -> edge1 (jj4)
    np.testing.assert_array_equal(np.asarray(ix), [-1, 3, -1, 0])
    np.testing.assert_array_equal(np.asarray(jx), [3, -1, -1, 1])


def test_neighbors_respects_valid_mask():
    kk = jnp.array([5, 5, 5])
    jj = jnp.array([1, 2, 3])
    valid = jnp.array([True, False, True])
    ix, jx = graph.neighbors(kk, jj, valid)
    np.testing.assert_array_equal(np.asarray(ix), [-1, -1, 0])
    np.testing.assert_array_equal(np.asarray(jx), [2, -1, -1])


def test_grad_clip():
    g = jax.grad(lambda x: jnp.sum(grad_clip(x * 100.0)) * 1.0)(
        jnp.ones(4))
    # d/dx of 100x clipped at 0.01 -> 0.01 * 100
    np.testing.assert_allclose(g, 1.0, atol=1e-6)


def test_gated_residual_shapes():
    m = GatedResidual(16)
    x = jax.random.normal(KEY, (10, 16))
    params = m.init(KEY, x)
    y = m.apply(params, x)
    assert y.shape == (10, 16)


def test_softagg_masking():
    m = SoftAgg(8)
    x = jax.random.normal(KEY, (6, 8))
    jx = jnp.array([0, 0, 1, 1, 2, 2])
    valid = jnp.array([True, True, True, True, False, False])
    params = m.init(KEY, x, jx, 3, valid)
    y = m.apply(params, x, jx, 3, valid)
    y2 = m.apply(params, x.at[4:].set(999.0), jx, 3, valid)
    # masked rows must not influence valid outputs
    np.testing.assert_allclose(np.asarray(y[:4]), np.asarray(y2[:4]),
                               atol=1e-5)


def test_encoder_output_shape():
    enc = BasicEncoder4(output_dim=128, norm_fn="instance")
    x = jax.random.normal(KEY, (1, 64, 96, 3))
    params = enc.init(KEY, x)
    y = enc.apply(params, x)
    assert y.shape == (1, 16, 24, 128)
    assert np.all(np.isfinite(np.asarray(y)))


def test_encoder_none_norm():
    enc = BasicEncoder4(output_dim=DIM, norm_fn="none")
    x = jax.random.normal(KEY, (1, 32, 32, 3))
    params = enc.init(KEY, x)
    y = enc.apply(params, x)
    assert y.shape == (1, 8, 8, DIM)


def test_update_shapes_and_masking():
    E = 16
    upd = Update()
    net = jax.random.normal(KEY, (E, DIM))
    inp = jax.random.normal(jax.random.PRNGKey(1), (E, DIM))
    corr = jax.random.normal(jax.random.PRNGKey(2), (E, 2 * 49 * 9))
    ii = jnp.arange(E) % 4
    jj = (jnp.arange(E) + 1) % 5
    kk = jnp.arange(E) % 8
    valid = jnp.arange(E) < 12

    params = upd.init(KEY, net, inp, corr, ii, jj, kk, valid)
    net2, delta, w = upd.apply(params, net, inp, corr, ii, jj, kk, valid)
    assert net2.shape == (E, DIM)
    assert delta.shape == (E, 2) and w.shape == (E, 2)
    # masked edges produce zeros
    np.testing.assert_allclose(np.asarray(net2[12:]), 0.0)
    np.testing.assert_allclose(np.asarray(delta[12:]), 0.0)
    # weights are sigmoid outputs in (0, 1)
    w_valid = np.asarray(w[:12])
    assert np.all((w_valid > 0) & (w_valid < 1))

    # invalid edges must not affect valid outputs
    corr_perturbed = corr.at[12:].set(777.0)
    _, delta2, _ = upd.apply(params, net, inp, corr_perturbed, ii, jj, kk,
                             valid)
    np.testing.assert_allclose(np.asarray(delta[:12]),
                               np.asarray(delta2[:12]), atol=1e-5)


def test_patchifier_end_to_end():
    pf = Patchifier()
    images = normalize_images(
        jax.random.randint(KEY, (2, 64, 96, 3), 0, 255).astype(jnp.uint8))
    coords = select_centroids(KEY, "RANDOM", 2, 16, 24, 8)
    params = pf.init(KEY, images, coords)
    fmap, gmap, imap_p, patches, index, clr = pf.apply(
        params, images, coords)
    assert fmap.shape == (2, 16, 24, 128)
    assert gmap.shape == (2, 8, 3, 3, 128)
    assert imap_p.shape == (2, 8, DIM)
    assert patches.shape == (2, 8, 3, 3, 3)
    assert clr.shape == (2, 8, 3)
    np.testing.assert_array_equal(np.asarray(index),
                                  np.repeat([0, 1], 8))
    # patch (x, y) channels hold the sampled centroid neighborhood coords
    c = np.asarray(coords)
    p = np.asarray(patches)
    np.testing.assert_allclose(p[0, :, 0, 1, 1], c[0, :, 0], atol=1e-4)
    np.testing.assert_allclose(p[0, :, 1, 1, 1], c[0, :, 1], atol=1e-4)
    # disps default to 1
    np.testing.assert_allclose(p[..., 2, :, :], 1.0, atol=1e-6)


def test_select_centroids_gradient_bias():
    from dpvo_tpu.models.vonet import image_gradient
    images = normalize_images(
        jax.random.randint(KEY, (1, 64, 64, 3), 0, 255).astype(jnp.uint8))
    g = image_gradient(images)
    assert g.shape == (1, 16, 16)
    coords = select_centroids(KEY, "GRADIENT_BIAS", 1, 16, 16, 4, gradient=g)
    assert coords.shape == (1, 4, 2)


def test_update_bf16():
    E = 8
    upd = Update(dtype=jnp.bfloat16)
    net = jax.random.normal(KEY, (E, DIM))
    inp = jax.random.normal(jax.random.PRNGKey(1), (E, DIM))
    corr = jax.random.normal(jax.random.PRNGKey(2), (E, 2 * 49 * 9))
    ii = jnp.arange(E) % 2
    jj = jnp.arange(E) % 3
    kk = jnp.arange(E) % 4
    params = upd.init(KEY, net, inp, corr, ii, jj, kk)
    net2, delta, w = upd.apply(params, net, inp, corr, ii, jj, kk)
    # heads are fp32 even in bf16 mode
    assert delta.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(delta)))


def test_corr_dense_raw_path_matches_array():
    """CorrDense's lazy raw-layout input ("raw", feat, inv) over a
    padded corr-sorted table must reproduce the interleaved-array path
    (same params: kernel ROWS are reordered, not relearned).  The math
    is an exact row reindexing, but the matmul accumulates in permuted
    order over a different row count (Es vs E), so the comparison is a
    tight allclose rather than bitwise (observed max diff ~9e-7)."""
    import numpy as np
    from dpvo_tpu.models.update import Update, DIM
    from dpvo_tpu.ops.corr_pallas import raw_to_ref_perm

    um = Update(3, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    E, Es = 8, 12
    corr = jax.random.normal(key, (E, 2 * 49 * 9))
    zi = jnp.zeros((E,), jnp.int32)
    p = um.init(key, jnp.zeros((E, DIM)), jnp.zeros((E, DIM)), corr,
                zi, zi, zi)
    n1, d1, w1 = um.apply(p, jnp.zeros((E, DIM)), jnp.zeros((E, DIM)),
                          corr, zi, zi, zi)
    # rebuild the raw-order features: feat_raw[raw_i] = feat_ref[ref(raw_i)]
    perm = raw_to_ref_perm()
    rng = np.random.default_rng(3)
    rows = rng.permutation(Es)[:E]
    feat = np.zeros((Es, 882), np.float32)
    feat[rows] = np.asarray(corr)[:, perm]
    inv = jnp.asarray(rows, jnp.int32)
    n2, d2, w2 = um.apply(p, jnp.zeros((E, DIM)), jnp.zeros((E, DIM)),
                          ("raw", jnp.asarray(feat), inv), zi, zi, zi)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                               atol=1e-5, rtol=1e-4)
