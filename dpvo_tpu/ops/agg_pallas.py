"""Pallas TPU kernel for the SoftAgg segment reductions.

The recurrent update's two SoftAggs (ref dpvo/blocks.py:31-48) reduce
(E, DIM) rows into per-group softmax-weighted sums and broadcast them
back.  The XLA sorted-segment path does this with two full-length
cumsums plus four row gathers over (E, 384) f32 — measured 4.3 ms per
SoftAgg at the retain-regime bucket (45k edges), ~8.6 ms/frame for the
pair (scripts/dev/update_net_profile.py).

This kernel computes the COMPACT per-group sums instead, in one pass:

    T1[g] = sum_{rows r in group g} exp(gate[r] - shift)
    T2[g] = sum_{rows r in group g} exp(gate[r] - shift) * val[r]

for rows sorted by group, where ``gid`` are the groups' dense ranks
(0, 1, 2, ... — nondecreasing, incrementing by at most 1 per row).  The
caller then finishes the softmax as Y = T2/T1 (the softmax denominator
is constant within a group), applies the output projection at COMPACT
group granularity, and broadcasts back with a single row gather — see
``models.blocks.SoftAgg``'s compact path.

Kernel structure (grid sequential over row blocks of BLK):

- each block's rows span at most BLK distinct groups (ranks increment
  by <= 1 per row), so the block's group-partial sums are ONE one-hot
  f32 MXU matmul: onehot (BLK+8, BLK) @ [e | e*f] (BLK, 2D);
- partials accumulate into a persistent (G_pad, 2D) f32 VMEM scratch at
  the 8-aligned dynamic sublane offset of the block's first group (the
  one-hot rows absorb the 0..7 misalignment), relying on the TPU grid's
  sequential execution — no atomics, deterministic;
- the last grid step copies the scratch to the output.

Measured (scripts/dev/update_net_profile.py, TPU v5e): 0.56 ms/call at
E=45056 vs 4.32 ms for the XLA sorted-segment SoftAgg inner, maxrel
3.5e-6 vs the f32 scatter reference.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 256          # rows per grid step (buckets are multiples of 2048)
BLK2 = BLK + 8     # one-hot rows: BLK groups + up to 7 of alignment slack


def _kernel(gid_smem, g_ref, f_ref, shift_ref, gidv_ref, out_ref,
            acc_ref):
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(b == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    g0 = gid_smem[b * BLK]
    g0a = pl.multiple_of((g0 // 8) * 8, 8)

    e = jnp.exp(g_ref[...].astype(jnp.float32) - shift_ref[...])
    ef = e * f_ref[...].astype(jnp.float32)
    cat = jnp.concatenate([e, ef], axis=1)               # (BLK, 2D)

    lid = gidv_ref[0, 0, :] - g0a                        # (BLK,) in [0, BLK2)
    rows = jax.lax.broadcasted_iota(jnp.int32, (BLK2, BLK), 0)
    onehot = (rows == lid[None, :]).astype(jnp.float32)
    # one-hot products are exact; HIGHEST keeps the f32 accumulation on
    # the MXU exact too (default precision loses ~2e-3 to bf16 passes)
    part = jax.lax.dot(onehot, cat,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)  # (BLK2, 2D)

    cur = acc_ref[pl.ds(g0a, BLK2), :]
    acc_ref[pl.ds(g0a, BLK2), :] = cur + part

    @pl.when(b == nb - 1)
    def _():
        out_ref[...] = acc_ref[...]


def padded_groups(g_cap):
    """Output rows for a given group capacity (alignment + slack pad)."""
    return g_cap + BLK2


@partial(jax.jit, static_argnames=("g_cap", "interpret"))
def segment_softmax_sums(gate_sorted, vals_sorted, shift, gid_sorted,
                         g_cap, interpret=False):
    """Compact dual segment sums for the softmax aggregation.

    gate_sorted (E, D) group-sorted gate rows (any float dtype)
    vals_sorted (E, D) group-sorted value rows
    shift       (1, D) f32 stability shift (softmax is invariant to any
                per-column constant within a group; a global column max
                is constant within every group)
    gid_sorted  (E,) int32 dense group ranks, nondecreasing, step <= 1
    g_cap       static group capacity (ranks must stay < g_cap; the
                engine guarantees this with the same unique-patch bound
                as BA's k_cap)
    Returns (padded_groups(g_cap), 2D) f32: [:, :D] = sum exp,
    [:, D:] = sum exp * vals, rows past the last rank zero.
    """
    E, D = gate_sorted.shape
    assert E % BLK == 0, E
    nb = E // BLK
    G_pad = padded_groups(g_cap)

    gidv = jnp.broadcast_to(gid_sorted.reshape(nb, 1, BLK), (nb, 8, BLK))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((BLK, D), lambda i, gs: (i, 0)),
            pl.BlockSpec((BLK, D), lambda i, gs: (i, 0)),
            pl.BlockSpec((1, D), lambda i, gs: (0, 0)),
            pl.BlockSpec((1, 8, BLK), lambda i, gs: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((G_pad, 2 * D), lambda i, gs: (0, 0)),
        scratch_shapes=[pltpu.VMEM((G_pad, 2 * D), jnp.float32)],
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((G_pad, 2 * D), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(gid_sorted, gate_sorted, vals_sorted, shift, gidv)


def _kernel_sum(gid_smem, v_ref, gidv_ref, out_ref, acc_ref):
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(b == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    g0 = gid_smem[b * BLK]
    g0a = pl.multiple_of((g0 // 8) * 8, 8)

    lid = gidv_ref[0, 0, :] - g0a
    rows = jax.lax.broadcasted_iota(jnp.int32, (BLK2, BLK), 0)
    onehot = (rows == lid[None, :]).astype(jnp.float32)
    part = jax.lax.dot(onehot, v_ref[...].astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)

    cur = acc_ref[pl.ds(g0a, BLK2), :]
    acc_ref[pl.ds(g0a, BLK2), :] = cur + part

    @pl.when(b == nb - 1)
    def _():
        out_ref[...] = acc_ref[...]


@partial(jax.jit, static_argnames=("g_cap", "interpret"))
def segment_sums(vals_sorted, gid_sorted, g_cap, interpret=False):
    """Plain compact segment sums: (E, D) group-sorted rows -> the
    (padded_groups(g_cap), D) f32 per-group totals.  Same contract as
    ``segment_softmax_sums`` (dense nondecreasing ranks, E % BLK == 0);
    D is padded to a lane multiple internally.

    Used by ``ops.ba.ba_iterative`` for the pose-depth coupling columns
    — replaces a blocked cumsum + run-boundary gathers over (E, 6*n_cap)
    (~1.2 ms/GN-iteration at the 45k-edge bucket).  Accumulation is
    per-group sequential across row blocks (f32), tighter than the
    cumsum-difference path it replaces.
    """
    E, D = vals_sorted.shape
    assert E % BLK == 0, E
    Dp = D + (-D % 128)
    if Dp != D:
        vals_sorted = jnp.pad(vals_sorted, ((0, 0), (0, Dp - D)))
    nb = E // BLK
    G_pad = padded_groups(g_cap)
    gidv = jnp.broadcast_to(gid_sorted.reshape(nb, 1, BLK), (nb, 8, BLK))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((BLK, Dp), lambda i, gs: (i, 0)),
            pl.BlockSpec((1, 8, BLK), lambda i, gs: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((G_pad, Dp), lambda i, gs: (0, 0)),
        scratch_shapes=[pltpu.VMEM((G_pad, Dp), jnp.float32)],
    )
    out = pl.pallas_call(
        _kernel_sum,
        out_shape=jax.ShapeDtypeStruct((G_pad, Dp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(gid_sorted, vals_sorted, gidv)
    return out[:, :D]


def segment_softmax_sums_xla(gate_sorted, vals_sorted, shift, gid_sorted,
                             g_cap):
    """Pure-XLA twin of ``segment_softmax_sums`` (CPU tests, fallback)."""
    e = jnp.exp(gate_sorted.astype(jnp.float32) - shift)
    ef = e * vals_sorted.astype(jnp.float32)
    cat = jnp.concatenate([e, ef], axis=1)
    return jax.ops.segment_sum(cat, gid_sorted,
                               num_segments=padded_groups(g_cap),
                               indices_are_sorted=True)
