"""SLAM engine device state: fixed-shape arrays + host-side bookkeeping.

The reference mutates CUDA ring buffers and grows edge lists with
``torch.cat`` (ref dpvo/patchgraph.py, dpvo.py:215-238).  XLA wants static
shapes, so here ALL device arrays are allocated once at capacity:

- frame-level tables at BUFFER_SIZE (poses, patches, intrinsics, colors),
- feature ring buffers at ``mem``/``pmem`` slots (fmap pyramid, gmap, imap),
- a fixed-capacity active-edge table with a validity count (edges are
  appended into free slots and compacted with gather permutations computed
  on the host, which owns the ii/jj/kk bookkeeping).

The inactive edge store (replayed by global BA, ref dpvo.py:305-325) keeps
its indices on the host (host-owned bookkeeping) and its target/weight
rows on device, so retiring edges never blocks on a device fetch.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import jax.numpy as jnp

from ..config import VOConfig
from ..models.update import DIM


@dataclass
class DeviceState:
    """All device-resident arrays (jnp)."""
    poses: Any        # (N, 7) f32 — world-from-camera (inverse poses)
    patches: Any      # (N*M, 3, P, P) f32
    intrinsics: Any   # (N, 4) f32 at feature resolution
    colors: Any       # (N, M, 3) u8
    points: Any       # (N*M, 3) f32 — world points for viz/export

    imap: Any         # (pmem*M, DIM) ctype
    gmap: Any         # (pmem*M, P, P, 128) ctype
    fmap1: Any        # (mem, h, w, 128) ctype
    fmap2: Any        # (mem, h//4, w//4, 128) ctype

    net: Any          # (E_cap, DIM) f32 — edge hidden state
    target: Any       # (E_cap, 2) f32
    weight: Any       # (E_cap, 2) f32

    # device twins of the host ii/jj/kk bookkeeping: update_step_dev
    # derives ALL per-update metadata from these in-program, so the host
    # uploads nothing per update (rows >= e_num are stale/masked)
    eii: Any          # (E_cap,) i32
    ejj: Any          # (E_cap,) i32
    ekk: Any          # (E_cap,) i32

    target_inac: Any  # (E_inac, 2) f32 — retired edges (global BA)
    weight_inac: Any  # (E_inac, 2) f32


@dataclass
class HostState:
    """Host-side bookkeeping (single source of truth for edge indices)."""
    n: int = 0                 # number of keyframes
    m: int = 0                 # number of patches
    counter: int = 0           # frames seen (including non-keyframed)
    tlist: list = field(default_factory=list)
    tstamps: np.ndarray | None = None          # (N,) int64 counter per slot

    # active edges (padded arrays of capacity E_cap; first e_num valid)
    ii: np.ndarray | None = None
    jj: np.ndarray | None = None
    kk: np.ndarray | None = None
    e_num: int = 0

    # inactive edge store for global BA: indices live on the host
    # (they are host-owned bookkeeping anyway); target/weight rows stay
    # ON DEVICE (DeviceState.target_inac/weight_inac) so retiring edges
    # never fetches — n_inac counts the filled rows
    ii_inac: np.ndarray | None = None
    jj_inac: np.ndarray | None = None
    kk_inac: np.ndarray | None = None
    n_inac: int = 0

    # relative poses of removed frames: {t1: (t0, dP 7-vec np)}
    delta: dict = field(default_factory=dict)


def allocate(cfg: VOConfig, ht: int, wd: int, P: int = 3,
             pmem: int | None = None, mem: int = 36) -> DeviceState:
    N = cfg.BUFFER_SIZE
    M = cfg.PATCHES_PER_FRAME
    E = cfg.edge_capacity()
    if pmem is None:
        pmem = cfg.MAX_EDGE_AGE if cfg.LOOP_CLOSURE else mem
    h, w = ht // 4, wd // 4
    ctype = jnp.bfloat16 if cfg.MIXED_PRECISION else jnp.float32
    # feature maps are stored zero-padded (see corr_pallas.padded_hw) so
    # the Pallas correlation kernel can slice aligned tap windows with no
    # bounds logic
    from ..ops.corr_pallas import padded_hw

    poses = jnp.zeros((N, 7), jnp.float32).at[:, 6].set(1.0)
    return DeviceState(
        poses=poses,
        patches=jnp.zeros((N * M, 3, P, P), jnp.float32),
        intrinsics=jnp.zeros((N, 4), jnp.float32),
        colors=jnp.zeros((N, M, 3), jnp.uint8),
        points=jnp.zeros((N * M, 3), jnp.float32),
        imap=jnp.zeros((pmem * M, DIM), ctype),
        gmap=jnp.zeros((pmem * M, P, P, 128), ctype),
        fmap1=jnp.zeros((mem, *padded_hw(h, w), 128), ctype),
        fmap2=jnp.zeros((mem, *padded_hw(h // 4, w // 4), 128), ctype),
        net=jnp.zeros((E, DIM), jnp.float32),
        target=jnp.zeros((E, 2), jnp.float32),
        weight=jnp.zeros((E, 2), jnp.float32),
        eii=jnp.zeros((E,), jnp.int32),
        ejj=jnp.zeros((E,), jnp.int32),
        ekk=jnp.zeros((E,), jnp.int32),
        target_inac=jnp.zeros((cfg.EDGE_CAPACITY_INAC, 2), jnp.float32),
        weight_inac=jnp.zeros((cfg.EDGE_CAPACITY_INAC, 2), jnp.float32),
    )


def allocate_host(cfg: VOConfig) -> HostState:
    N = cfg.BUFFER_SIZE
    E = cfg.edge_capacity()
    hs = HostState()
    hs.tstamps = np.zeros((N,), np.int64)
    hs.ii = np.zeros((E,), np.int32)
    hs.jj = np.zeros((E,), np.int32)
    hs.kk = np.zeros((E,), np.int32)
    hs.ii_inac = np.zeros((0,), np.int32)
    hs.jj_inac = np.zeros((0,), np.int32)
    hs.kk_inac = np.zeros((0,), np.int32)

    return hs
