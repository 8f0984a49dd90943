"""Pallas correlation kernel vs the XLA reference path (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpvo_tpu.ops import corr as corr_ops
from dpvo_tpu.ops import corr_pallas as cp

KEY = jax.random.PRNGKey(5)


def make_case(E=32, F=3, H=24, W=32, C=128, seed=0):
    rng = np.random.default_rng(seed)
    K = 40
    gmap = jnp.asarray(rng.normal(size=(K, 3, 3, C)), jnp.float32)
    fmap = jnp.asarray(rng.normal(size=(F, H, W, C)), jnp.float32)
    # coords in-bounds with margin; grouped by frame per TILE
    coords = jnp.asarray(rng.uniform(6, min(H, W) - 7, (E, 2, 3, 3)),
                         jnp.float32)
    kidx = jnp.asarray(rng.integers(0, K, E), jnp.int32)
    n_tiles = E // cp.TILE
    tf = jnp.asarray(rng.integers(0, F, n_tiles), jnp.int32)
    fidx = jnp.repeat(tf, cp.TILE)
    return gmap, fmap, coords, kidx, fidx, tf


@pytest.mark.parametrize("version", [1, 3])
def test_matches_xla_reference(version):
    gmap, fmap, coords, kidx, fidx, tf = make_case()
    ref = corr_ops.corr(gmap, fmap, coords, kidx, fidx, radius=3)
    out = cp.corr_grouped(gmap, cp.pad_fmap(fmap), coords, kidx, tf,
                          interpret=True, version=version)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("version", [1, 3])
def test_out_of_bounds_zeros(version):
    """Windows fully outside the frame must produce zeros (CUDA
    bounds-mask semantics)."""
    gmap, fmap, coords, kidx, fidx, tf = make_case()
    # push the first tile's coords far outside
    coords = coords.at[:cp.TILE].set(-500.0)
    out = cp.corr_grouped(gmap, cp.pad_fmap(fmap), coords, kidx, tf,
                          interpret=True, version=version)
    np.testing.assert_allclose(np.asarray(out[:cp.TILE]), 0.0)
    # and matches the reference on those edges too
    ref = corr_ops.corr(gmap, fmap, coords, kidx, fidx, radius=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3)


@pytest.mark.parametrize("version", [1, 3])
def test_border_windows_match(version):
    """Partially overlapping windows at the image border."""
    gmap, fmap, coords, kidx, fidx, tf = make_case()
    edge_coords = jnp.asarray(
        np.random.default_rng(7).uniform(-2, 4, (cp.TILE, 2, 3, 3)),
        jnp.float32)
    coords = coords.at[:cp.TILE].set(edge_coords)
    ref = corr_ops.corr(gmap, fmap, coords, kidx, fidx, radius=3)
    out = cp.corr_grouped(gmap, cp.pad_fmap(fmap), coords, kidx, tf,
                          interpret=True, version=version)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("version", [4, 9])
def test_fused_two_level_matches_two_calls(version):
    """corr_pallas_fused == two corr_pallas calls (levels stacked), and
    its raw layout is matmul-equivalent to the reference layout under
    the raw_to_ref_perm row permutation (CorrDense's raw path).

    v9 (the TPU default) is bit-identical to v4 on real hardware
    (scripts/dev/corr_variants.py: EXACT at E=16384 and E=49152); on
    CPU interpret its batched blends reassociate the bilinear FMAs, so
    it is compared with a ~1e-5 tolerance here while v4 stays exact."""
    rng = np.random.default_rng(1)
    F, H, W, C = 5, 32, 48, 128
    fmap1 = jnp.asarray(rng.normal(size=(F, H, W, C)), jnp.float32)
    fmap2 = jnp.asarray(rng.normal(size=(F, H // 2, W // 2, C)),
                        jnp.float32)
    f1p, f2p = cp.pad_fmap(fmap1), cp.pad_fmap(fmap2)
    E = 64
    g = jnp.asarray(rng.normal(size=(E, 9, C)), jnp.float32)
    coords = jnp.asarray(rng.uniform(-4, 40, (E, 2, 3, 3)), jnp.float32)
    tf = jnp.asarray(np.sort(rng.integers(0, F, E // cp.TILE)), jnp.int32)
    nl = jnp.full((1,), 3, jnp.int32)   # last tile dead

    fused = cp.corr_pallas_fused(g, f1p, f2p, coords, tf, n_live=nl,
                                 interpret=True, version=version)
    c1 = cp.corr_pallas(g, f1p, coords, tf, n_live=nl, interpret=True,
                        raw=True)
    c2 = cp.corr_pallas(g, f2p, coords / 4.0, tf, n_live=nl,
                        interpret=True, raw=True)
    want = np.asarray(jnp.stack([c1, c2], 1))
    if version == 4:
        np.testing.assert_array_equal(np.asarray(fused), want)
    else:
        np.testing.assert_allclose(np.asarray(fused), want, atol=1e-4)
    # dead tail tiles are zero
    assert not np.asarray(fused)[3 * cp.TILE:].any()

    # raw-order matmul equivalence: feat_raw @ W[perm] == feat_ref @ W
    feat_raw = np.asarray(fused).reshape(E, -1)
    r1 = cp.corr_pallas(g, f1p, coords, tf, n_live=nl, interpret=True)
    r2 = cp.corr_pallas(g, f2p, coords / 4.0, tf, n_live=nl,
                        interpret=True)
    feat_ref = np.asarray(jnp.stack([r1, r2], -1).reshape(E, -1))
    Wm = rng.normal(size=(2 * cp.RAW_DIM, 8)).astype(np.float32)
    perm = np.asarray(cp.raw_to_ref_perm())
    np.testing.assert_allclose(feat_raw @ Wm[perm], feat_ref @ Wm,
                               atol=2e-3)


def test_v10_matches_v4_and_row_map():
    """The v10 MXU kernel (the TPU default) against v4: tolerance-equal
    (the MXU accumulates in a different order; the <1% gate mirrors the
    reference's fp16 corr acceptance, ref correlation_test.py:245-253),
    dead lanes zero, dead tail tiles zero, and the v10_row_map makes the
    (E, 1152) feature vector matmul-equivalent to the reference layout
    (CorrDense's v10 raw path)."""
    rng = np.random.default_rng(2)
    F, H, W, C = 5, 32, 48, 128
    fmap1 = jnp.asarray(rng.normal(size=(F, H, W, C)), jnp.float32)
    fmap2 = jnp.asarray(rng.normal(size=(F, H // 2, W // 2, C)),
                        jnp.float32)
    f1p, f2p = cp.pad_fmap(fmap1), cp.pad_fmap(fmap2)
    E = 64
    g = jnp.asarray(rng.normal(size=(E, 9, C)), jnp.float32)
    coords = jnp.asarray(rng.uniform(-4, 40, (E, 2, 3, 3)), jnp.float32)
    tf = jnp.asarray(np.sort(rng.integers(0, F, E // cp.TILE)), jnp.int32)
    nl = jnp.full((1,), 3, jnp.int32)   # last tile dead

    out10 = np.asarray(cp.corr_pallas_fused(
        g, f1p, f2p, coords, tf, n_live=nl, interpret=True, version=10))
    assert out10.shape == (E, cp.P2, 128)
    ref4 = np.asarray(cp.corr_pallas_fused(
        g, f1p, f2p, coords, tf, n_live=nl, interpret=True, version=4))

    # lanes (level*64 + dy*8 + dx) -> (E, level, p, dy, dx), live 7x7
    t = out10.reshape(E, cp.P2, 2, 8, 8)
    live = t[:, :, :, :7, :7].transpose(0, 2, 1, 3, 4)
    denom = np.abs(ref4).max() + 1e-9
    rel = np.abs(live - ref4).max() / denom
    assert rel < 1e-2, rel                      # the reference fp16 gate
    # dead lanes and dead tail tiles are exactly zero
    assert not t[:, :, :, 7, :].any() and not t[:, :, :, :, 7].any()
    assert not out10[3 * cp.TILE:].any()

    # v10_row_map matmul equivalence: the kernel's OWN live features,
    # re-laid out into the reference interleave, produce the same
    # matmul (isolates the map from kernel accumulation differences)
    feat_ref = np.zeros((E, 2 * cp.RAW_DIM), np.float32)
    for level in range(2):
        for p in range(cp.P2):
            py, px = p // 3, p % 3
            for dy in range(7):
                for dx in range(7):
                    ridx = (((dx * 7 + dy) * 3 + py) * 3 + px) * 2 + level
                    feat_ref[:, ridx] = t[:, p, level, dy, dx]
    Wm = rng.normal(size=(2 * cp.RAW_DIM, 8)).astype(np.float32)
    Wz = np.concatenate([Wm, np.zeros((1, 8), np.float32)])
    rows = np.asarray(cp.v10_row_map())
    got = out10.reshape(E, -1) @ Wz[rows]
    np.testing.assert_allclose(got, feat_ref @ Wm, atol=1e-3)


def test_v12_matches_v4_and_row_map():
    """The v12 MXU no-roll kernel against v4 (same gate as v10), plus
    dead-tile zeros and the v12_row_map zero-row matmul equivalence
    (v12's dead lanes carry garbage by design — the map must kill
    them)."""
    rng = np.random.default_rng(4)
    F, H, W, C = 5, 32, 48, 128
    fmap1 = jnp.asarray(rng.normal(size=(F, H, W, C)), jnp.float32)
    fmap2 = jnp.asarray(rng.normal(size=(F, H // 2, W // 2, C)),
                        jnp.float32)
    f1p, f2p = cp.pad_fmap(fmap1), cp.pad_fmap(fmap2)
    E = 64
    g = jnp.asarray(rng.normal(size=(E, 9, C)), jnp.float32)
    coords = jnp.asarray(rng.uniform(-4, 40, (E, 2, 3, 3)), jnp.float32)
    tf = jnp.asarray(np.sort(rng.integers(0, F, E // cp.TILE)), jnp.int32)
    nl = jnp.full((1,), 3, jnp.int32)   # last tile dead

    out12 = np.asarray(cp.corr_pallas_fused(
        g, f1p, f2p, coords, tf, n_live=nl, interpret=True, version=12))
    assert out12.shape == (E, cp.P2, 256)
    ref4 = np.asarray(cp.corr_pallas_fused(
        g, f1p, f2p, coords, tf, n_live=nl, interpret=True, version=4))

    # lanes (level*128 + dy*16 + dx') -> (E, level, p, dy, dx), live 7x7
    t = out12.reshape(E, cp.P2, 2, 8, 16)
    live = t[:, :, :, :7, :7].transpose(0, 2, 1, 3, 4)
    denom = np.abs(ref4).max() + 1e-9
    rel = np.abs(live - ref4).max() / denom
    assert rel < 1e-2, rel
    assert not out12[3 * cp.TILE:].any()

    # zero-row matmul: the map must annihilate the garbage dead lanes
    feat_ref = np.zeros((E, 2 * cp.RAW_DIM), np.float32)
    for level in range(2):
        for p in range(cp.P2):
            py, px = p // 3, p % 3
            for dy in range(7):
                for dx in range(7):
                    ridx = (((dx * 7 + dy) * 3 + py) * 3 + px) * 2 + level
                    feat_ref[:, ridx] = t[:, p, level, dy, dx]
    Wm = rng.normal(size=(2 * cp.RAW_DIM, 8)).astype(np.float32)
    Wz = np.concatenate([Wm, np.zeros((1, 8), np.float32)])
    rows = np.asarray(cp.v12_row_map())
    got = out12.reshape(E, -1) @ Wz[rows]
    np.testing.assert_allclose(got, feat_ref @ Wm, atol=1e-3)


def test_corrdense_v10_raw_matches_interleaved():
    """CorrDense fed the v10 tuple form == CorrDense on the interleaved
    reference features, with the SAME (882, DIM) checkpoint params."""
    from dpvo_tpu.models.update import CorrDense
    rng = np.random.default_rng(3)
    E, D = 8, 16
    feat_ref = rng.normal(size=(E, 2 * cp.RAW_DIM)).astype(np.float32)
    # place into the v10 layout: lanes (p, level, dy<8, dx<8)
    v10 = np.zeros((E, cp.P2, 2, 8, 8), np.float32)
    t = feat_ref.reshape(E, 49, 3, 3, 2)        # (dxdy, py, px, level)
    for dx in range(7):
        for dy in range(7):
            for py in range(3):
                for px in range(3):
                    v10[:, py * 3 + px, :, dy, dx] = \
                        t[:, dx * 7 + dy, py, px, :]
    feat10 = v10.reshape(E, -1)

    m = CorrDense(D)
    params = m.init(KEY, jnp.asarray(feat_ref))
    want = m.apply(params, jnp.asarray(feat_ref))
    inv = jnp.arange(E, dtype=jnp.int32)
    got = m.apply(params, ("raw", jnp.asarray(feat10), inv))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4)


def test_v13_enc_matches_v12_pipeline():
    """corr_pallas_enc (v13: in-kernel gmap gather + corr-encoder
    matmul) against the v12 pipeline (XLA g_pre gather -> v12 kernel ->
    row-mapped matmul) in interpret mode, plus CorrDense's "enc" form
    against its raw-v12 form with the SAME checkpoint params."""
    from dpvo_tpu.models.update import CorrDense
    rng = np.random.default_rng(7)
    F, H, W, C, K, E, DIMo = 3, 32, 48, 128, 40, 32, 16
    fmap1 = jnp.asarray(rng.normal(size=(F, H, W, C)), jnp.float32)
    fmap2 = jnp.asarray(rng.normal(size=(F, H // 4, W // 4, C)),
                        jnp.float32)
    f1p, f2p = cp.pad_fmap(fmap1), cp.pad_fmap(fmap2)
    g_all = jnp.asarray(rng.normal(size=(K, cp.P2, C)), jnp.float32)
    kk = jnp.asarray(rng.integers(0, K, (E,)), jnp.int32)
    coords = jnp.asarray(rng.uniform(-4, 40, (E, 2, 3, 3)), jnp.float32)
    tf = jnp.asarray(np.sort(rng.integers(0, F, E // cp.TILE)),
                     jnp.int32)
    nl = jnp.full((1,), 1, jnp.int32)   # second tile dead

    m = CorrDense(DIMo)
    params = m.init(KEY, jnp.zeros((2, 2 * cp.RAW_DIM)))
    kernel = params["params"]["kernel"]

    feat12 = cp.corr_pallas_fused(g_all[kk], f1p, f2p, coords, tf,
                                  n_live=nl, interpret=True, version=12)
    want = m.apply(params, ("raw", feat12.reshape(E, -1),
                            jnp.arange(E, dtype=jnp.int32)))

    w_enc = cp.map_enc_kernel(kernel)
    feat13 = cp.corr_pallas_enc(g_all, kk, w_enc, f1p, f2p, coords, tf,
                                n_live=nl, interpret=True)
    assert feat13.shape == (E, DIMo)
    got = m.apply(params, ("enc", feat13,
                           jnp.arange(E, dtype=jnp.int32)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    # dead tile -> zero pre-bias activations
    bias = np.asarray(params["params"]["bias"])
    np.testing.assert_allclose(np.asarray(got[cp.TILE:]),
                               np.tile(bias, (E - cp.TILE, 1)),
                               atol=1e-6)
