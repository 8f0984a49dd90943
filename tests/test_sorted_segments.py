"""Sorted-segment ops vs scatter-based references, and the engine's host
grouping helpers."""
import numpy as np
import jax
import jax.numpy as jnp

from dpvo_tpu.ops import scatter

KEY = jax.random.PRNGKey(9)


def test_group_meta():
    ids = np.array([5, 2, 5, 9, 2, 2])
    perm, inv, start, end = scatter.group_meta(ids)
    s = ids[perm]
    assert (np.diff(s) >= 0).all()
    # start/end bound each sorted row's group
    for r in range(6):
        assert (s[start[r]:end[r] + 1] == s[r]).all()
    # inv is the inverse of perm
    np.testing.assert_array_equal(perm[inv], np.arange(6))


def test_sorted_segment_sum_matches_segment_sum():
    rng = np.random.default_rng(0)
    E, D = 200, 16
    ids = rng.integers(0, 20, E)
    vals = jnp.asarray(rng.normal(size=(E, D)), jnp.float32)
    perm, inv, start, end = scatter.group_meta(ids)

    out_rows = scatter.sorted_segment_sum(vals[perm], jnp.asarray(start),
                                          jnp.asarray(end))
    # broadcast-back comparison with scatter path
    ref = scatter.scatter_sum(vals, jnp.asarray(ids), 20)
    np.testing.assert_allclose(np.asarray(out_rows[inv]),
                               np.asarray(ref)[ids], atol=1e-4)


def test_sorted_softmax_sum_matches_scatter_path():
    rng = np.random.default_rng(1)
    E, D = 150, 8
    ids = rng.integers(0, 12, E)
    gate = jnp.asarray(rng.normal(size=(E, D)) * 3, jnp.float32)
    vals = jnp.asarray(rng.normal(size=(E, D)), jnp.float32)

    perm, inv, start, end = scatter.group_meta(ids)
    out = scatter.sorted_segment_softmax_sum(
        gate[perm], vals[perm], jnp.asarray(start), jnp.asarray(end))[inv]

    w = scatter.scatter_softmax(gate, jnp.asarray(ids), 12)
    y = scatter.scatter_sum(w * vals, jnp.asarray(ids), 12)
    ref = np.asarray(y)[ids]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_softagg_sorted_path_matches_generic():
    from dpvo_tpu.models.blocks import SoftAgg
    rng = np.random.default_rng(2)
    E, D = 64, 16
    ids = rng.integers(0, 7, E)
    x = jnp.asarray(rng.normal(size=(E, D)), jnp.float32)

    m = SoftAgg(D)
    # generic path init/apply
    _, ku = scatter.compactify(jnp.asarray(ids), size=E)
    params = m.init(KEY, x, ku, E)
    out_generic = m.apply(params, x, ku, E)

    meta = tuple(jnp.asarray(a) for a in scatter.group_meta(ids))
    out_sorted = m.apply(params, x, sorted_meta=meta)
    np.testing.assert_allclose(np.asarray(out_sorted),
                               np.asarray(out_generic), atol=1e-4)


def test_group_meta_compact_device():
    ids = np.array([5, 2, 5, 9, 2, 2, 7, 7])
    perm, gid_s, gid_o = jax.tree.map(
        np.asarray, scatter.group_meta_compact_device(jnp.asarray(ids)))
    s = ids[perm]
    assert (np.diff(s) >= 0).all()
    # dense ranks: nondecreasing, step <= 1, start at 0
    assert gid_s[0] == 0
    assert ((np.diff(gid_s) == 0) | (np.diff(gid_s) == 1)).all()
    # same id -> same rank, different id -> different rank
    for r in range(len(ids)):
        assert gid_o[r] == gid_s[list(perm).index(r)]
    ranks = {i: gid_o[ids == i][0] for i in np.unique(ids)}
    assert sorted(ranks.values()) == list(range(len(ranks)))


def test_segment_softmax_sums_xla_vs_scatter():
    from dpvo_tpu.ops import agg_pallas
    rng = np.random.default_rng(3)
    E, D, G = 96, 8, 11
    ids = np.sort(rng.integers(0, G, E)).astype(np.int32)
    new = np.ones(E, bool)
    new[1:] = ids[1:] != ids[:-1]
    gid = jnp.asarray((np.cumsum(new) - 1).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(E, D)) * 2, jnp.float32)
    f = jnp.asarray(rng.normal(size=(E, D)), jnp.float32)
    shift = jnp.max(g, axis=0, keepdims=True)

    T = agg_pallas.segment_softmax_sums_xla(g, f, shift, gid, G)
    e = np.exp(np.asarray(g) - np.asarray(shift))
    ref1 = scatter.scatter_sum(jnp.asarray(e), gid,
                               agg_pallas.padded_groups(G))
    ref2 = scatter.scatter_sum(jnp.asarray(e) * f, gid,
                               agg_pallas.padded_groups(G))
    np.testing.assert_allclose(np.asarray(T[:, :D]), np.asarray(ref1),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(T[:, D:]), np.asarray(ref2),
                               rtol=1e-5, atol=1e-6)


def test_segment_softmax_sums_pallas_interpret():
    """The TPU kernel, run in interpret mode on CPU, matches the XLA
    twin at an engine-shaped problem (E multiple of BLK)."""
    from dpvo_tpu.ops import agg_pallas
    rng = np.random.default_rng(4)
    E, D, G_cap = 2 * agg_pallas.BLK, 384, 64
    ids = np.sort(rng.integers(0, G_cap - 2, E)).astype(np.int32)
    new = np.ones(E, bool)
    new[1:] = ids[1:] != ids[:-1]
    gid = jnp.asarray((np.cumsum(new) - 1).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(E, D)), jnp.float32)
    f = jnp.asarray(rng.normal(size=(E, D)), jnp.float32)
    shift = jnp.max(g, axis=0, keepdims=True)

    out = agg_pallas.segment_softmax_sums(g, f, shift, gid, G_cap,
                                          interpret=True)
    ref = agg_pallas.segment_softmax_sums_xla(g, f, shift, gid, G_cap)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-5)


def test_softagg_compact_path_matches_generic():
    from dpvo_tpu.models.blocks import SoftAgg
    rng = np.random.default_rng(5)
    E, D = 64, 16
    ids = rng.integers(0, 7, E)
    x = jnp.asarray(rng.normal(size=(E, D)), jnp.float32)

    m = SoftAgg(D)
    _, ku = scatter.compactify(jnp.asarray(ids), size=E)
    params = m.init(KEY, x, ku, E)
    out_generic = m.apply(params, x, ku, E)

    cm = scatter.group_meta_compact_device(jnp.asarray(ids))
    out_compact = m.apply(params, x, compact_meta=cm, g_cap=16)
    np.testing.assert_allclose(np.asarray(out_compact),
                               np.asarray(out_generic), atol=1e-4)


def test_update_compact_meta_matches_agg_meta():
    """Update with compact_meta (TPU fast path, XLA twin on CPU) matches
    the sorted-meta path, including invalid-row masking."""
    from dpvo_tpu.models.update import Update, DIM
    rng = np.random.default_rng(6)
    E, P = 48, 3
    ii = rng.integers(0, 6, E).astype(np.int32)
    jj = (ii + rng.integers(1, 4, E)).astype(np.int32)
    kk = (ii * 4 + rng.integers(0, 4, E)).astype(np.int32)
    valid = np.ones(E, bool)
    valid[-5:] = False
    net = jnp.asarray(rng.normal(size=(E, DIM)), jnp.float32)
    inp = jnp.asarray(rng.normal(size=(E, DIM)), jnp.float32)
    corr = jnp.asarray(rng.normal(size=(E, 2 * 49 * P * P)), jnp.float32)

    from dpvo_tpu.ops import graph
    from dpvo_tpu.ops.scatter import (group_meta_device,
                                      group_meta_compact_device)
    INT_MAX = np.iinfo(np.int32).max
    kk_g = jnp.where(jnp.asarray(valid), jnp.asarray(kk), -1)
    pair = jnp.where(jnp.asarray(valid),
                     jnp.asarray(ii) * 12345 + jnp.asarray(jj), -1)
    agg_meta = (group_meta_device(kk_g), group_meta_device(pair))
    nbrs = graph.neighbors(jnp.asarray(kk), jnp.asarray(jj),
                           jnp.asarray(valid))

    mod = Update(P)
    params = mod.init(KEY, net, inp, corr, jnp.asarray(ii),
                      jnp.asarray(jj), jnp.asarray(kk))
    out_sorted = mod.apply(params, net, inp, corr, jnp.asarray(ii),
                           jnp.asarray(jj), jnp.asarray(kk),
                           jnp.asarray(valid), agg_meta=agg_meta,
                           nbrs=nbrs)

    kk_m = jnp.where(jnp.asarray(valid), jnp.asarray(kk), INT_MAX)
    pair_m = jnp.where(jnp.asarray(valid),
                       jnp.asarray(ii) * 12345 + jnp.asarray(jj),
                       INT_MAX)
    cm = (group_meta_compact_device(kk_m),
          group_meta_compact_device(pair_m))
    out_compact = mod.apply(params, net, inp, corr, jnp.asarray(ii),
                            jnp.asarray(jj), jnp.asarray(kk),
                            jnp.asarray(valid), nbrs=nbrs,
                            compact_meta=cm, g_cap=32)
    for a, b in zip(out_sorted, out_compact):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4)


def test_engine_corr_grouping():
    """Host grouping produces frame-pure tiles covering every edge."""
    from dpvo_tpu.config import VOConfig
    from dpvo_tpu.engine import DPVO
    from dpvo_tpu.ops.corr_pallas import TILE

    cfg = VOConfig(BUFFER_SIZE=64, PATCHES_PER_FRAME=8, EDGE_CAPACITY=256,
                   MIXED_PRECISION=False, CORR_BACKEND="xla")
    slam = DPVO(cfg, network=None, ht=64, wd=96)
    rng = np.random.default_rng(0)
    e = 100
    slam.hs.jj[:e] = rng.integers(0, 20, e)
    slam.hs.e_num = e

    bucket = slam._edge_bucket()
    perm, inv, tile_frame = [np.asarray(a)
                             for a in slam._corr_grouping(bucket)]
    E, Es = bucket, bucket + slam.mem * TILE
    assert len(perm) == Es and Es % TILE == 0
    # every table row appears exactly once at its inv position
    np.testing.assert_array_equal(perm[inv], np.arange(E))
    # tiles are frame-pure: all edges in tile t target slot tile_frame[t]
    slots = slam.hs.jj[:bucket] % slam.mem
    for t in range(Es // TILE):
        rows = perm[t * TILE:(t + 1) * TILE]
        assert (slots[rows] == tile_frame[t]).all()


def test_neighbors_host_matches_device():
    from dpvo_tpu.ops import graph
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    E, e_num = 64, 50
    kk = rng.integers(0, 12, E).astype(np.int32)
    jj = rng.integers(0, 8, E).astype(np.int32)
    valid = np.arange(E) < e_num

    ix_h, jx_h = graph.neighbors_host(kk, jj, e_num)
    ix_d, jx_d = graph.neighbors(jnp.asarray(kk), jnp.asarray(jj),
                                 jnp.asarray(valid))
    np.testing.assert_array_equal(ix_h, np.asarray(ix_d))
    np.testing.assert_array_equal(jx_h, np.asarray(jx_d))


def test_group_meta_device_matches_host():
    """Device sort metadata == host numpy version bit-for-bit."""
    rng = np.random.default_rng(3)
    for E in (6, 97, 512):
        ids = rng.integers(-1, 25, E).astype(np.int32)
        h = scatter.group_meta(ids)
        d = jax.jit(scatter.group_meta_device)(jnp.asarray(ids))
        for a, b, name in zip(h, d, ("perm", "inv", "start", "end")):
            np.testing.assert_array_equal(a, np.asarray(b), err_msg=name)


def test_corr_grouping_device_matches_host_semantics():
    """Device corr grouping: same invariants as the host version —
    every edge exactly once at its inv position, frame-pure tiles."""
    from dpvo_tpu.ops.corr_pallas import corr_grouping_device, TILE

    rng = np.random.default_rng(4)
    mem = 12
    for E in (64, 256):
        jj = rng.integers(0, 40, E).astype(np.int32)
        perm, inv, tf, n_live = jax.jit(
            corr_grouping_device, static_argnums=1)(jnp.asarray(jj), mem)
        perm, inv, tf = np.asarray(perm), np.asarray(inv), np.asarray(tf)
        Es = E + (mem + 1) * TILE
        assert len(perm) == Es and len(tf) == Es // TILE
        np.testing.assert_array_equal(perm[inv], np.arange(E))
        slots = jj % mem
        # without a valid mask every row is live and covered by n_live
        assert (inv < int(n_live) * TILE).all()
        for t in range(int(n_live)):
            rows = perm[t * TILE:(t + 1) * TILE]
            assert (slots[rows] == tf[t]).all(), t
        assert (tf < mem).all()


def test_corr_grouping_device_dead_tail():
    """With a valid mask, stale rows group into skippable tail tiles:
    every live row lands below n_live*TILE, tiles stay frame-pure, and
    dead tiles never interleave with live ones."""
    from dpvo_tpu.ops.corr_pallas import corr_grouping_device, TILE

    rng = np.random.default_rng(7)
    mem = 12
    for E, e_num in ((64, 33), (256, 199), (128, 128)):
        jj = rng.integers(0, 40, E).astype(np.int32)
        valid = np.arange(E) < e_num
        perm, inv, tf, n_live = jax.jit(
            corr_grouping_device, static_argnums=1)(
                jnp.asarray(jj), mem, jnp.asarray(valid))
        perm, inv, tf = np.asarray(perm), np.asarray(inv), np.asarray(tf)
        n_live = int(n_live)
        Es = E + (mem + 1) * TILE
        assert len(perm) == Es
        np.testing.assert_array_equal(perm[inv], np.arange(E))
        # live rows all within live tiles; dead rows all beyond
        assert (inv[:e_num] < n_live * TILE).all()
        assert (inv[e_num:] >= n_live * TILE).all()
        assert (tf < mem).all()  # dead tiles clamp to a real ring slot
        slots = jj % mem
        for t in range(n_live):
            rows = perm[t * TILE:(t + 1) * TILE]
            live_rows = rows[rows < e_num] if e_num < E else rows
            assert (slots[live_rows] == tf[t]).all(), t
