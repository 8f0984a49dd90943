"""Phase attribution for the recurrent update net at retain scale.

The retain-regime frame profile (frame_profile.py 45056 44640 22) shows
"update net (incl meta)" = 11.4 ms while its matmuls are ~215 GFLOP
(~1.1 ms at peak bf16) — this script attributes the rest: SoftAgg
segment machinery, neighbor gathers, LayerNorms, heads.

Run on TPU:  python scripts/dev/update_net_profile.py [bucket]
"""
import sys
import os

import numpy as np
import jax
import jax.numpy as jnp

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(_HERE)))
sys.path.insert(0, _HERE)
from microbench import timed

import flax.linen as nn
from dpvo_tpu.models.update import Update, DIM, CorrDense
from dpvo_tpu.models.blocks import SoftAgg, GatedResidual
from dpvo_tpu.ops.scatter import group_meta_device
from dpvo_tpu.ops import graph

bucket = int(sys.argv[1]) if len(sys.argv) > 1 else 45056
live = int(sys.argv[2]) if len(sys.argv) > 2 else 44640
window = int(sys.argv[3]) if len(sys.argv) > 3 else 22
M, P = 96, 3
n_now = window * 2
dt = jnp.bfloat16

rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)

kk_np = np.sort(rng.integers((n_now - window) * M, n_now * M, bucket)
                ).astype(np.int32)
ii_np = kk_np // M
jj_np = np.minimum(ii_np + rng.integers(1, 12, bucket), n_now).astype(
    np.int32)
eii, ejj, ekk = map(jnp.asarray, (ii_np, jj_np, kk_np))
e_num = jnp.int32(live)

net0 = jnp.asarray(rng.normal(size=(bucket, DIM)), jnp.float32)
inp0 = jnp.asarray(rng.normal(size=(bucket, DIM)), dt)
corr0 = jnp.asarray(rng.normal(size=(bucket, 2 * 49 * P * P)), dt)

update_mod = Update(P, dtype=dt)
u_params = update_mod.init(
    key, jnp.zeros((8, DIM)), jnp.zeros((8, DIM)),
    jnp.zeros((8, 2 * 49 * P * P)), jnp.zeros((8,), jnp.int32),
    jnp.zeros((8,), jnp.int32), jnp.zeros((8,), jnp.int32))


def live_sum(out):
    tot = jnp.float32(0)
    for x in jax.tree.leaves(out):
        tot = tot + jnp.sum(x.astype(jnp.float32))
    return jnp.clip(tot, -1e6, 1e6)[None]


def with_meta(f):
    # thread the int_arg perturbation (e_num + z, z==0 at runtime) into
    # every tensor input so no probe body is loop-invariant inside
    # microbench's fori_loop (XLA would hoist it: near-zero times)
    def g(e_num, net, inp, corr, ii, jj, kk):
        z = e_num // jnp.int32(2147483647)      # 0 at runtime, opaque
        net = net + z.astype(net.dtype)
        inp = inp + z.astype(inp.dtype)
        corr = corr + z.astype(corr.dtype)
        ii, jj, kk = ii + z, jj + z, kk + z
        valid = jnp.arange(bucket, dtype=jnp.int32) < e_num
        kk_g = jnp.where(valid, kk, -1)
        pair = jnp.where(valid, ii * jnp.int32(12345) + jj, -1)
        agg_meta = (group_meta_device(kk_g), group_meta_device(pair))
        nbrs = graph.neighbors(kk, jj, valid)
        return f(valid, agg_meta, nbrs, net, inp, corr, ii, jj, kk)
    return g


def f_full(valid, agg_meta, nbrs, net, inp, corr, ii, jj, kk):
    out = update_mod.apply(u_params, net, inp, corr, ii, jj, kk, valid,
                           agg_meta=agg_meta, nbrs=nbrs)
    return live_sum(out)


def f_meta_only(valid, agg_meta, nbrs, net, inp, corr, ii, jj, kk):
    return live_sum((agg_meta, nbrs))


# ---- isolated pieces (own params, same shapes) ----
softagg = SoftAgg(DIM, dt)
sa_params = softagg.init(key, jnp.zeros((8, DIM), dt),
                         jnp.zeros((8,), jnp.int32), 4)
x0 = jnp.asarray(rng.normal(size=(bucket, DIM)), dt)


def f_softagg(valid, agg_meta, nbrs, net, inp, corr, ii, jj, kk):
    out = softagg.apply(sa_params, x0, sorted_meta=agg_meta[0])
    return live_sum(out)


def f_neighbor_gather(valid, agg_meta, nbrs, net, inp, corr, ii, jj, kk):
    ix, jx = nbrs
    a = net.astype(dt)[jnp.maximum(ix, 0)]
    b = net.astype(dt)[jnp.maximum(jx, 0)]
    return live_sum((a, b))


dense_mod = nn.Dense(DIM, dtype=dt)
d_params = dense_mod.init(key, jnp.zeros((8, DIM), dt))


def f_mlps(valid, agg_meta, nbrs, net, inp, corr, ii, jj, kk):
    # 11 DIM->DIM matmuls + the 882->DIM corr encoder: the raw matmul
    # load of one update (heads excluded).  Random params: an all-zeros
    # kernel lets XLA's algebraic simplifier erase the 882->DIM matmul.
    h = CorrDense(DIM, dt).apply(
        {"params": {
            "kernel": rng.normal(size=(2 * 49 * P * P, DIM)).astype(
                np.float32),
            "bias": rng.normal(size=(DIM,)).astype(np.float32)}}, corr)
    x = net.astype(dt) + h
    for _ in range(11):
        x = dense_mod.apply(d_params, x)
    return live_sum(x)


def f_cumsum(valid, agg_meta, nbrs, net, inp, corr, ii, jj, kk):
    return live_sum(jnp.cumsum(net, axis=0)[-1])


def f_cumsum_blocked(valid, agg_meta, nbrs, net, inp, corr, ii, jj, kk):
    from dpvo_tpu.ops.ba import _blocked_cumsum
    return live_sum(_blocked_cumsum(net)[-1])


def f_row_gather(valid, agg_meta, nbrs, net, inp, corr, ii, jj, kk):
    (perm, inv_perm, start, end) = agg_meta[0]
    return live_sum(net[end])


def with_compact_meta(f):
    """Like with_meta but building the round-5 compact-path metadata:
    one (kk, jj) lexsort shared by neighbors + agg_kk, one pair sort."""
    INT_MAX = jnp.iinfo(jnp.int32).max

    def g(e_num, net, inp, corr, ii, jj, kk):
        z = e_num // jnp.int32(2147483647)      # 0 at runtime, opaque
        net = net + z.astype(net.dtype)
        inp = inp + z.astype(inp.dtype)
        corr = corr + z.astype(corr.dtype)
        ii, jj, kk = ii + z, jj + z, kk + z
        valid = jnp.arange(bucket, dtype=jnp.int32) < e_num
        kk_g = jnp.where(valid, kk, INT_MAX)
        pair = jnp.where(valid, ii * jnp.int32(12345) + jj, INT_MAX)
        order = jnp.lexsort((jj, kk_g)).astype(jnp.int32)
        nbrs = graph.neighbors_from_order(kk_g, valid, order)
        from dpvo_tpu.ops.scatter import group_meta_compact_device
        cm = (group_meta_compact_device(kk_g, order=order),
              group_meta_compact_device(pair))
        return f(valid, cm, nbrs, net, inp, corr, ii, jj, kk)
    return g


def f_full_compact(valid, cm, nbrs, net, inp, corr, ii, jj, kk):
    out = update_mod.apply(u_params, net, inp, corr, ii, jj, kk, valid,
                           nbrs=nbrs, compact_meta=cm, g_cap=4104)
    return live_sum(out)


def f_meta_compact(valid, cm, nbrs, net, inp, corr, ii, jj, kk):
    return live_sum((cm, nbrs))


ARGS = (net0, inp0, corr0, eii, ejj, ekk)
timed(f"update full COMPACT (incl meta) bucket={bucket}",
      with_compact_meta(f_full_compact), e_num, *ARGS, reps=8)
timed(f"meta only COMPACT bucket={bucket}",
      with_compact_meta(f_meta_compact), e_num, *ARGS, reps=8)
timed(f"update full (incl meta) bucket={bucket}", with_meta(f_full),
      e_num, *ARGS, reps=8)
timed(f"meta only bucket={bucket}", with_meta(f_meta_only),
      e_num, *ARGS, reps=8)
timed(f"one SoftAgg (sorted path) bucket={bucket}", with_meta(f_softagg),
      e_num, *ARGS, reps=8)
timed(f"neighbor gathers bucket={bucket}", with_meta(f_neighbor_gather),
      e_num, *ARGS, reps=8)
timed(f"12 dense matmuls bucket={bucket}", with_meta(f_mlps),
      e_num, *ARGS, reps=8)
timed(f"cumsum (E,384) f32 bucket={bucket}", with_meta(f_cumsum),
      e_num, *ARGS, reps=8)
timed(f"blocked cumsum (E,384) bucket={bucket}",
      with_meta(f_cumsum_blocked), e_num, *ARGS, reps=8)
timed(f"row gather (E,384) f32 bucket={bucket}",
      with_meta(f_row_gather), e_num, *ARGS, reps=8)
print("done", flush=True)
