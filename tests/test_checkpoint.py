"""Checkpoint IO tests: npz round-trip + torch .pth import name mapping.

The torch import is validated against a synthetic state_dict with the
exact reference module names/shapes (net.py:23-96, extractor.py:200-264),
so reference-trained weights drop in without the reference installed.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpvo_tpu.models import Patchifier, Update, DIM
from dpvo_tpu.utils.checkpoint import (load_network, save_network,
                                       load_torch_network)


def make_params():
    key = jax.random.PRNGKey(0)
    pf = Patchifier(3)
    upd = Update(3)
    p = pf.init(key, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 4, 2)))
    u = upd.init(key, jnp.zeros((8, DIM)), jnp.zeros((8, DIM)),
                 jnp.zeros((8, 2 * 49 * 9)), jnp.zeros((8,), jnp.int32),
                 jnp.zeros((8,), jnp.int32), jnp.zeros((8,), jnp.int32))
    return p, u


def test_npz_roundtrip(tmp_path):
    p, u = make_params()
    path = str(tmp_path / "net.npz")
    save_network(path, p, u)
    p2, u2 = load_network(path)
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(u), jax.tree.leaves(u2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def reference_state_dict():
    """Synthetic torch state_dict with the reference's exact names/shapes."""
    torch = pytest.importorskip("torch")
    sd = {}

    def conv(name, cin, cout, k):
        sd[f"{name}.weight"] = torch.randn(cout, cin, k, k)
        sd[f"{name}.bias"] = torch.randn(cout)

    def lin(name, cin, cout):
        sd[f"{name}.weight"] = torch.randn(cout, cin)
        sd[f"{name}.bias"] = torch.randn(cout)

    def ln(name, d):
        sd[f"{name}.weight"] = torch.randn(d)
        sd[f"{name}.bias"] = torch.randn(d)

    for enc, outd in (("patchify.fnet", 128), ("patchify.inet", 384)):
        conv(f"{enc}.conv1", 3, 32, 7)
        conv(f"{enc}.conv2", 64, outd, 1)
        for layer, cin, cout in ((f"{enc}.layer1.0", 32, 32),
                                 (f"{enc}.layer1.1", 32, 32),
                                 (f"{enc}.layer2.0", 32, 64),
                                 (f"{enc}.layer2.1", 64, 64)):
            conv(f"{layer}.conv1", cin, cout, 3)
            conv(f"{layer}.conv2", cout, cout, 3)
        conv(f"{enc}.layer2.0.downsample.0", 32, 64, 1)

    u = "update"
    lin(f"{u}.corr.0", 2 * 49 * 9, 384)
    lin(f"{u}.corr.2", 384, 384)
    ln(f"{u}.corr.3", 384)
    lin(f"{u}.corr.5", 384, 384)
    ln(f"{u}.norm", 384)
    for c in ("c1", "c2"):
        lin(f"{u}.{c}.0", 384, 384)
        lin(f"{u}.{c}.2", 384, 384)
    for agg in ("agg_kk", "agg_ij"):
        for nm in ("f", "g", "h"):
            lin(f"{u}.{agg}.{nm}", 384, 384)
    ln(f"{u}.gru.0", 384)
    ln(f"{u}.gru.2", 384)
    for g in ("gru.1", "gru.3"):
        lin(f"{u}.{g}.gate.0", 384, 384)
        lin(f"{u}.{g}.res.0", 384, 384)
        lin(f"{u}.{g}.res.2", 384, 384)
    lin(f"{u}.d.1", 384, 2)
    lin(f"{u}.w.1", 384, 2)
    # legacy key that must be dropped (ref dpvo.py:97)
    sd["update.lmbda"] = torch.zeros(1)
    # DDP prefix variant (ref train.py:237)
    sd = {("module." + k if k.startswith("patchify.fnet.conv1") else k): v
          for k, v in sd.items()}
    return sd


def test_torch_import_matches_flax_structure(tmp_path):
    torch = pytest.importorskip("torch")
    sd = reference_state_dict()
    path = str(tmp_path / "ref.pth")
    torch.save(sd, path)

    p_imported, u_imported = load_torch_network(path)
    p_ours, u_ours = make_params()

    # identical tree structure and shapes
    ours_flat = jax.tree_util.tree_flatten_with_path(p_ours)[0]
    imp_flat = jax.tree_util.tree_flatten_with_path(p_imported)[0]
    ours_map = {jax.tree_util.keystr(k): v.shape for k, v in ours_flat}
    imp_map = {jax.tree_util.keystr(k): v.shape for k, v in imp_flat}
    assert ours_map == imp_map, set(ours_map) ^ set(imp_map)

    ours_flat = jax.tree_util.tree_flatten_with_path(u_ours)[0]
    imp_flat = jax.tree_util.tree_flatten_with_path(u_imported)[0]
    ours_map = {jax.tree_util.keystr(k): v.shape for k, v in ours_flat}
    imp_map = {jax.tree_util.keystr(k): v.shape for k, v in imp_flat}
    assert ours_map == imp_map, set(ours_map) ^ set(imp_map)

    # imported weights actually run through the modules
    upd = Update(3)
    E = 8
    net, delta, w = upd.apply(
        u_imported, jnp.zeros((E, DIM)), jnp.zeros((E, DIM)),
        jnp.zeros((E, 2 * 49 * 9)), jnp.zeros((E,), jnp.int32),
        jnp.zeros((E,), jnp.int32), jnp.zeros((E,), jnp.int32))
    assert np.all(np.isfinite(np.asarray(delta)))
