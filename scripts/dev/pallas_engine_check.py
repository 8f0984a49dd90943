"""On-TPU equivalence check: update_step_dev Pallas path vs XLA path.

Validates the corr-sorted reprojection + pair-table + (optionally v13)
plumbing against the straight XLA branch at a small bucket.  Pallas
corr differs from the XLA gather corr only by f32 summation order
(v12/v13 also by bf16 window rounding, bounded by the reference's fp16
gate), so poses/patches must agree tightly.

Run: python scripts/dev/pallas_engine_check.py
     DPVO_CORR_VERSION=13 python scripts/dev/pallas_engine_check.py
"""
import sys
import os

import numpy as np
import jax
import jax.numpy as jnp

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(_HERE)))

from dpvo_tpu.engine import kernels
from dpvo_tpu.models.update import Update, DIM
from dpvo_tpu.ops import corr_pallas as cp

bucket = int(sys.argv[1]) if len(sys.argv) > 1 else 512
M, P = 8, 3
mem = pmem = 12
N = 64
h, w = 32, 40
n_cap, k_cap = 8, 256
n_now = 10

rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)
# f32 + DPVO_CORR_VERSION=9 (bit-exact kernel) isolates the engine
# plumbing: pallas-vs-xla then differs only by f32 summation order.
# bf16 (default) additionally exercises the compute-dtype kernels,
# whose corr rounding random weights amplify through the update net.
dt = (jnp.float32 if os.environ.get("DPVO_CHECK_F32")
      else jnp.bfloat16)

update_mod = Update(P, dtype=dt)
u_params = update_mod.init(
    key, jnp.zeros((8, DIM)), jnp.zeros((8, DIM)),
    jnp.zeros((8, 2 * 49 * P * P)), jnp.zeros((8,), jnp.int32),
    jnp.zeros((8,), jnp.int32), jnp.zeros((8,), jnp.int32))

poses = jnp.zeros((N, 7)).at[:, 6].set(1.0)
poses = poses.at[:n_now, 0].set(jnp.arange(n_now) * 0.05)
patches = jnp.asarray(
    np.stack([rng.uniform(5, w - 5, (N * M, 1, 1)) * np.ones((1, P, P)),
              rng.uniform(5, h - 5, (N * M, 1, 1)) * np.ones((1, P, P)),
              rng.uniform(0.5, 2, (N * M, 1, 1)) * np.ones((1, P, P))],
             axis=1), jnp.float32)
intrinsics = jnp.tile(jnp.asarray([[40., 40., 20., 16.]]), (N, 1))
imap = jnp.asarray(rng.normal(size=(pmem * M, DIM)) * 0.1, dt)
gmap = jnp.asarray(rng.normal(size=(pmem * M, P, P, 128)) * 0.1, dt)
fmap1 = jnp.asarray(rng.normal(size=(mem, *cp.padded_hw(h, w), 128)) * 0.1,
                    dt)
fmap2 = jnp.asarray(
    rng.normal(size=(mem, *cp.padded_hw(h // 4, w // 4), 128)) * 0.1, dt)
net_tab = jnp.asarray(rng.normal(size=(bucket, DIM)) * 0.1, jnp.float32)
tt = jnp.zeros((bucket, 2), jnp.float32)
wt = jnp.zeros((bucket, 2), jnp.float32)

live = bucket - 37
# UNIQUE (kk, jj) pairs like a real engine table (duplicates would make
# the temporal-neighbor prev/next choice tie-dependent, which the two
# paths may break differently)
per_patch = max(1, bucket // ((n_now - 2) * M))
kk_l, jj_l = [], []
for k in range(2 * M, n_now * M):
    js = rng.permutation(n_now)[:per_patch]
    for j in js:
        kk_l.append(k)
        jj_l.append(j)
while len(kk_l) < bucket:           # pad, stays past `live` rows
    kk_l.append(n_now * M - 1)
    jj_l.append(n_now - 1)
kk_np = np.asarray(kk_l[:bucket], np.int32)
jj_np = np.asarray(jj_l[:bucket], np.int32)
ii_np = kk_np // M
eii, ejj, ekk = jnp.asarray(ii_np), jnp.asarray(jj_np), jnp.asarray(kk_np)
mm_blob = jnp.zeros((8 * 16,), jnp.int32)

kw = dict(update_mod=update_mod, M=M, pmem=pmem, mem=mem, n_cap=n_cap,
          k_cap=k_cap, bucket=bucket, iterations=2, run_ba=True,
          has_mm=False)


def run(use_pallas):
    # update_step_dev donates several args — pass fresh copies per run
    return kernels.update_step_dev(
        u_params, jnp.array(poses), jnp.array(patches), intrinsics,
        imap, gmap, fmap1, fmap2,
        jnp.array(net_tab), jnp.array(tt), jnp.array(wt),
        eii, ejj, ekk, jnp.int32(live),
        jnp.int32(n_now - 6), jnp.int32(n_now), mm_blob,
        use_pallas=use_pallas, **kw)


print(f"corr version: {cp.FUSED_VERSION}, bucket {bucket}", flush=True)
out_p = run(True)
dump = os.environ.get("DPVO_CHECK_DUMP")
if dump:
    np.savez(dump, **{n: np.asarray(a, np.float32)
                      for n, a in zip(
                          ["net", "target", "weight", "delta", "poses",
                           "patches"], out_p) if a is not None})
out_x = run(False)
names = ["net", "target", "weight", "delta", "poses", "patches", "mag"]
# Gates: geometry must agree tightly; the raw net/delta/weight rows are
# reported but gated loosely — at RANDOM weights the recurrent net
# amplifies the paths' benign differences (BA edge-sum tie order, f32
# softmax grouping) into O(0.1) rows, a PRE-EXISTING property measured
# identical before and after the round-5 sorted-corr refactor (this
# script's pallas outputs are bit-identical across that change).
GATES = {"poses": 1e-2, "patches": 1e-2, "target": 5e-2,
         "net": 2.0, "delta": 2.0, "weight": 1.0}
ok = True
for name, a, b in zip(names, out_p, out_x):
    if a is None or b is None:
        continue
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    d = np.abs(a - b).max()
    rel = d / (np.abs(b).max() + 1e-9)
    print(f"{name:8s} maxabs {d:.3e}  maxrel {rel:.3e}", flush=True)
    ok &= rel < GATES.get(name, 5e-2)
print("OK" if ok else "MISMATCH")
sys.exit(0 if ok else 1)
