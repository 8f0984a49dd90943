"""Device-mesh utilities for multi-chip scaling.

The reference is strictly single-GPU (SURVEY.md §2.2: no DDP/TP/PP
anywhere).  This module is the new TPU-native capability: a
``jax.sharding.Mesh`` over ICI with data-parallel training as the default
layout (batch sharded over the ``dp`` axis, parameters replicated — XLA
inserts the psum gradient reduction; "How to Scale Your Model" recipe).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name="dp"):
    """1-D mesh over the first n_devices.

    Raises if the host has fewer than ``n_devices`` devices — silently
    truncating would let a multi-chip validation "pass" on a 1-device
    mesh without testing any sharding.
    """
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"make_mesh({n_devices}) but only {len(devs)} "
                f"device(s) visible on backend "
                f"{jax.default_backend()!r}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def shard_batch(mesh, tree, axis_name="dp"):
    """Shard the leading (batch) axis of every leaf over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh, tree):
    """Replicate a pytree (params, opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
