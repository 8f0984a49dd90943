"""Local-window BA variants at the retain-regime bucket (round 4).

Measures ba_iterative (dense J_eff assembly) vs ba_global (compressed
coupling + matrix-free CG) at the same operating point, plus phase
probes of ba_iterative's per-iteration pieces, to decide which solver
the engine should dispatch at large buckets (VERDICT r3 next#1c).

Run on TPU: python scripts/dev/ba_bench.py [bucket]
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
for cg in (12, 24, 48):
    run(ba_ops.ba_global, f"ba_global 2it cg={cg} bucket={bucket}",
        iterations=2, cg_iters=cg)
