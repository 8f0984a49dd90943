"""Local-window BA variants at the retain-regime bucket (round 4).

Measures ba_iterative (dense J_eff assembly) at the operating point,
plus phase probes of its per-iteration pieces.  Pass the token ``cg``
to also time ba_global (compressed coupling + matrix-free CG) at
cg_iters 12/24/48 — it measured 92-256 ms at bucket 49152 (round 4),
so it is off by default.

Run on TPU: python scripts/dev/ba_bench.py [bucket] [live] [cg]
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

from dpvo_tpu.ops import ba as ba_ops

bucket = int(sys.argv[1]) if len(sys.argv) > 1 else 49152
live = int(sys.argv[2]) if len(sys.argv) > 2 else bucket - 4000
n_cap, k_cap = 16, 4096
N, M, P = 256, 96, 3
n_now = 44
window = 22

rng = np.random.default_rng(0)
poses = jnp.zeros((N, 7)).at[:, 6].set(1.0)
patches = jnp.asarray(rng.uniform(1, 4, (N * M, 3, P, P)), jnp.float32)
intr = jnp.asarray([160.0, 160.0, 80.0, 60.0])

kk = np.sort(rng.integers((n_now - window) * M, n_now * M, bucket)
             ).astype(np.int32)
ii = kk // M
jj = np.minimum(ii + rng.integers(1, 12, bucket), n_now).astype(np.int32)
target = jnp.asarray(rng.uniform(0, 150, (bucket, 2)), jnp.float32)
weight = jnp.asarray(rng.uniform(0, 1, (bucket, 2)), jnp.float32)
eii, ejj, ekk = jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk)
e_num = jnp.int32(live)
t0, t1 = jnp.int32(n_now - 10), jnp.int32(n_now)


def live_sum(out):
    tot = jnp.float32(0)
    for x in jax.tree.leaves(out):
        tot = tot + jnp.sum(x.astype(jnp.float32))
    return jnp.clip(tot, -1e6, 1e6)[None]


def run(fn, name, **kw):
    def f(e_num, poses, patches, target, weight, eii, ejj, ekk):
        valid = jnp.arange(bucket, dtype=jnp.int32) < e_num
        return live_sum(fn(
            poses, patches, intr, target, weight, jnp.float32(1e-4),
            eii, ejj, ekk, valid, t0, t1,
            n_cap=n_cap, k_cap=k_cap, **kw))
    timed(name, f, e_num, poses, patches, target, weight, eii, ejj,
          ekk, reps=8)


run(ba_ops.ba_iterative, f"ba_iterative 2it bucket={bucket}",
    iterations=2)
if "cg" in sys.argv:
    for cg in (12, 24, 48):
        run(ba_ops.ba_global, f"ba_global 2it cg={cg} bucket={bucket}",
            iterations=2, cg_iters=cg)


# ---------------------------------------------------------------- phases
# Per-phase probes of ba_iterative's iteration body (mirrors ops/ba.py;
# keep in sync) — attribution only, not exactness.

import jax.scipy.linalg as jsl
from dpvo_tpu.ops import lie
from dpvo_tpu.ops.ba import (_blocked_cumsum, _edge_terms_center,
                             _INT_MAX)

E = bucket
P = 3
fx = fy = jnp.float32(160.0)
cx, cy = jnp.float32(80.0), jnp.float32(60.0)
lmbda = jnp.float32(1e-4)


def live_sum1(*xs):
    tot = jnp.float32(0)
    for x in xs:
        tot = tot + jnp.sum(x.astype(jnp.float32))
    return jnp.clip(tot, -1e6, 1e6)[None]


def phase(fn, name):
    # thread the int_arg perturbation (e_num + z, z==0 at runtime) into
    # EVERY input so no probe body is loop-invariant inside microbench's
    # fori_loop — otherwise XLA hoists it and reports near-zero time
    def f(e_num, poses, patches, target, weight, eii, ejj, ekk):
        z = e_num // jnp.int32(2147483647)      # 0 at runtime, opaque
        zf = z.astype(jnp.float32)
        poses = poses + zf
        patches = patches + zf
        target = target + zf
        weight = weight + zf
        eii, ejj, ekk = eii + z, ejj + z, ekk + z
        valid = jnp.arange(bucket, dtype=jnp.int32) < e_num
        return fn(valid, poses, patches, target, weight, eii, ejj, ekk)
    timed(name, f, e_num, poses, patches, target, weight, eii, ejj,
          ekk, reps=8)


def sort_meta(valid, eii, ejj, ekk, target, weight):
    kk_m = jnp.where(valid, ekk, _INT_MAX)
    eperm = jnp.argsort(kk_m, stable=True)
    out = (eii[eperm], ejj[eperm], ekk[eperm], valid[eperm],
           target[eperm], weight[eperm], kk_m[eperm])
    return out


def p_sort(valid, poses, patches, target, weight, eii, ejj, ekk):
    return live_sum1(*sort_meta(valid, eii, ejj, ekk, target, weight))


def p_terms(valid, poses, patches, target, weight, eii, ejj, ekk):
    ctr = patches[:, :, P // 2, P // 2]
    r, mask, Ji, Jj, Jz = _edge_terms_center(
        poses, ctr, fx, fy, cx, cy, target, eii, ejj, ekk)
    return live_sum1(r, mask, Ji, Jj, Jz)


def _jeff(valid, poses, patches, target, weight, eii, ejj, ekk):
    ctr = patches[:, :, P // 2, P // 2]
    r, mask, Ji, Jj, Jz = _edge_terms_center(
        poses, ctr, fx, fy, cx, cy, target, eii, ejj, ekk)
    w = mask[:, None] * weight * valid[:, None]
    li = eii - t0
    lj = ejj - t0
    vi = (li >= 0) & (li < n_cap) & valid
    vj = (lj >= 0) & (lj < n_cap) & valid
    lic = jnp.clip(li, 0, n_cap - 1)
    ljc = jnp.clip(lj, 0, n_cap - 1)
    oh_i = ((lic[:, None] == jnp.arange(n_cap)) & vi[:, None]
            ).astype(jnp.float32)
    oh_j = ((ljc[:, None] == jnp.arange(n_cap)) & vj[:, None]
            ).astype(jnp.float32)
    Jeff = (-oh_i[:, None, :, None] * Ji[:, :, None, :]
            + oh_j[:, None, :, None] * Jj[:, :, None, :])
    Jeff = Jeff.reshape(E, 2, 6 * n_cap)
    wJeff = w[:, :, None] * Jeff
    return r, w, Jz, Jeff, wJeff


def p_jeff_B(valid, poses, patches, target, weight, eii, ejj, ekk):
    r, w, Jz, Jeff, wJeff = _jeff(valid, poses, patches, target, weight,
                                  eii, ejj, ekk)
    B = jnp.einsum("era,erb->ab", wJeff, Jeff,
                   precision=jax.lax.Precision.HIGHEST)
    vvec = jnp.einsum("era,er->a", wJeff, r,
                      precision=jax.lax.Precision.HIGHEST)
    return live_sum1(B, vvec)


def p_coupling(valid, poses, patches, target, weight, eii, ejj, ekk):
    r, w, Jz, Jeff, wJeff = _jeff(valid, poses, patches, target, weight,
                                  eii, ejj, ekk)
    A = jnp.einsum("er,era->ea", w * Jz, Jeff,
                   precision=jax.lax.Precision.HIGHEST)
    cs = _blocked_cumsum(A)
    Cu = jnp.stack([jnp.sum(w * Jz * Jz, axis=1),
                    jnp.sum(w * r * Jz, axis=1)], axis=-1)
    cs2 = _blocked_cumsum(Cu)
    return live_sum1(cs[-1], cs2[-1])


def p_solve96(valid, poses, patches, target, weight, eii, ejj, ekk):
    # standalone 96x96 Cholesky + solve (data-independent of edges)
    D = 6 * n_cap
    a = jnp.tanh(poses[:D, :1]) * 0.01
    S = jnp.eye(D) * 2.0 + a @ a.T
    y = poses[:D, 1] * 0.0 + 1.0
    L, lower = jsl.cho_factor(S, lower=True)
    dX = jsl.cho_solve((L, lower), y)
    return live_sum1(dX)


def p_retr(valid, poses, patches, target, weight, eii, ejj, ekk):
    dxi = jnp.tanh(poses[:, :6]) * 1e-3
    poses2 = lie.se3_retr(poses, dxi)
    return live_sum1(poses2)


for nm, fn in (("sort+perm", p_sort), ("edge terms", p_terms),
               ("Jeff+B+v einsums", p_jeff_B),
               ("coupling cumsums", p_coupling),
               ("cho 96 solve", p_solve96), ("pose retr", p_retr)):
    phase(fn, f"{nm} bucket={bucket}")
