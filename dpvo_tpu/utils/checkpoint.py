"""Network checkpoint IO.

Native format: a single .npz of flattened flax params (fast, no torch
needed).  Torch ``.pth`` checkpoints from the reference are converted by
name mapping (ref dpvo.py:90-101 strips ``module.`` prefixes and the
legacy ``update.lmbda`` key) so reference-trained weights can be imported
for parity testing.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict


def save_network(path, params_patchify, params_update):
    flat = {}
    for prefix, params in (("patchify", params_patchify),
                           ("update", params_update)):
        for k, v in flatten_dict(params).items():
            flat[prefix + "/" + "/".join(k)] = np.asarray(v)
    np.savez(path, **flat)


def load_network(path):
    if path.endswith(".pth") or path.endswith(".pt"):
        return load_torch_network(path)
    data = np.load(path)
    trees = {"patchify": {}, "update": {}}
    for key in data.files:
        prefix, rest = key.split("/", 1)
        trees[prefix][tuple(rest.split("/"))] = jnp.asarray(data[key])
    return (unflatten_dict(trees["patchify"]),
            unflatten_dict(trees["update"]))


# --- torch .pth import ------------------------------------------------------

def _conv(w):
    """torch conv (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))


def _lin(w):
    """torch linear (O, I) -> flax kernel (I, O)."""
    return jnp.asarray(np.transpose(w, (1, 0)))


def _t(w):
    return jnp.asarray(np.asarray(w))


def _encoder_tree(sd, prefix):
    """Map a reference BasicEncoder4 state_dict subtree to the flax
    BasicEncoder4 params (ref extractor.py:200-264; norms are
    parameter-free instance/none, so only convs carry weights)."""
    t = {}
    t["conv1"] = {"kernel": _conv(sd[f"{prefix}.conv1.weight"]),
                  "bias": _t(sd[f"{prefix}.conv1.bias"])}
    t["conv2"] = {"kernel": _conv(sd[f"{prefix}.conv2.weight"]),
                  "bias": _t(sd[f"{prefix}.conv2.bias"])}
    for li, layer in ((1, "layer1"), (2, "layer2")):
        for bi in (0, 1):
            blk = {}
            for ci in (1, 2):
                blk[f"conv{ci}"] = {
                    "kernel": _conv(sd[f"{prefix}.{layer}.{bi}.conv{ci}.weight"]),
                    "bias": _t(sd[f"{prefix}.{layer}.{bi}.conv{ci}.bias"]),
                }
            dskey = f"{prefix}.{layer}.{bi}.downsample.0.weight"
            if dskey in sd:
                blk["downsample"] = {
                    "kernel": _conv(sd[dskey]),
                    "bias": _t(sd[f"{prefix}.{layer}.{bi}.downsample.0.bias"]),
                }
            t[f"{layer}_{bi}"] = blk
    return t


def _seq_lin(sd, prefix, idx):
    return {"kernel": _lin(sd[f"{prefix}.{idx}.weight"]),
            "bias": _t(sd[f"{prefix}.{idx}.bias"])}


def _ln(sd, key):
    return {"scale": _t(sd[f"{key}.weight"]), "bias": _t(sd[f"{key}.bias"])}


def load_torch_network(path):
    """Convert a reference VONet .pth into (params_patchify, params_update).

    Name map follows net.py:23-96 module structure.
    """
    import torch
    raw = torch.load(path, map_location="cpu", weights_only=True)
    return convert_state_dict(raw)


def convert_state_dict(raw):
    """Convert a reference VONet state_dict (name -> tensor/ndarray) into
    (params_patchify, params_update) flax trees (used directly by the
    torch-parity tests)."""
    sd = {}
    for k, v in raw.items():
        if "update.lmbda" in k:
            continue
        v = v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
        sd[k.replace("module.", "")] = v

    has_patchify = any(k.startswith("patchify.") for k in sd)
    has_update = any(k.startswith("update.") for k in sd)

    patchify = {"params": {
        "fnet": _encoder_tree(sd, "patchify.fnet"),
        "inet": _encoder_tree(sd, "patchify.inet"),
    }} if has_patchify else None
    if not has_update:
        return patchify, None

    u = "update"
    upd = {
        "corr1": _seq_lin(sd, f"{u}.corr", 0),
        "corr2": _seq_lin(sd, f"{u}.corr", 2),
        "corr_norm": _ln(sd, f"{u}.corr.3"),
        "corr3": _seq_lin(sd, f"{u}.corr", 5),
        "norm": _ln(sd, f"{u}.norm"),
        "c1_0": _seq_lin(sd, f"{u}.c1", 0),
        "c1_1": _seq_lin(sd, f"{u}.c1", 2),
        "c2_0": _seq_lin(sd, f"{u}.c2", 0),
        "c2_1": _seq_lin(sd, f"{u}.c2", 2),
        "agg_kk": {nm: {"kernel": _lin(sd[f"{u}.agg_kk.{nm}.weight"]),
                        "bias": _t(sd[f"{u}.agg_kk.{nm}.bias"])}
                   for nm in ("f", "g", "h")},
        "agg_ij": {nm: {"kernel": _lin(sd[f"{u}.agg_ij.{nm}.weight"]),
                        "bias": _t(sd[f"{u}.agg_ij.{nm}.bias"])}
                   for nm in ("f", "g", "h")},
        "gru_norm1": _ln(sd, f"{u}.gru.0"),
        "gru_res1": {"gate": _seq_lin(sd, f"{u}.gru.1.gate", 0),
                     "res1": _seq_lin(sd, f"{u}.gru.1.res", 0),
                     "res2": _seq_lin(sd, f"{u}.gru.1.res", 2)},
        "gru_norm2": _ln(sd, f"{u}.gru.2"),
        "gru_res2": {"gate": _seq_lin(sd, f"{u}.gru.3.gate", 0),
                     "res1": _seq_lin(sd, f"{u}.gru.3.res", 0),
                     "res2": _seq_lin(sd, f"{u}.gru.3.res", 2)},
        "d": _seq_lin(sd, f"{u}.d", 1),
        "w": _seq_lin(sd, f"{u}.w", 1),
    }
    update = {"params": upd}
    return patchify, update


# --- full training-state checkpoint (params + optimizer + step) ------------

def save_train_state(path, state):
    """Save a full TrainState (params, optimizer state, step) as npz.

    The tree structure is NOT serialized — restore requires a template
    with the same structure (tx.init of the same optimizer), which is
    how resume works anyway.  (Reference train.py:374-378 saves params
    only; step/optimizer resume is the SURVEY §5 bar.)
    """
    leaves = jax.tree_util.tree_leaves(state)
    np.savez(path, **{f"l{i}": np.asarray(x)
                      for i, x in enumerate(leaves)})


def load_train_state(path, template):
    """Restore a TrainState saved by save_train_state; ``template`` is a
    state with identical tree structure (e.g. freshly initialized)."""
    import jax
    data = np.load(path)
    leaves_t, treedef = jax.tree_util.tree_flatten(template)
    if len(data.files) != len(leaves_t):
        raise ValueError(
            f"checkpoint has {len(data.files)} leaves, template has "
            f"{len(leaves_t)} — optimizer/model structure mismatch")
    leaves = [jnp.asarray(data[f"l{i}"]) for i in range(len(leaves_t))]
    return jax.tree_util.tree_unflatten(treedef, leaves)
