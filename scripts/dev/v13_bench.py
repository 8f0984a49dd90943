"""v13 decision bench: fused gather+encoder corr kernel vs the v12
pipeline (XLA g_pre gather -> v12 kernel -> XLA row-mapped matmul) at
the retain operating point.  See corr_pallas._kernel_fused_v13.

Usage: python scripts/dev/v13_bench.py [E] [K]
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts/dev")

import numpy as np
import jax
import jax.numpy as jnp
from microbench import timed
from dpvo_tpu.ops import corr_pallas as cp

E = int(sys.argv[1]) if len(sys.argv) > 1 else 49152
K = int(sys.argv[2]) if len(sys.argv) > 2 else 3456
memN, C = 20, 128
rng = np.random.default_rng(0)
H1, W1 = 120, 160
g_all = jnp.asarray(rng.standard_normal((K, cp.P2, C)), jnp.bfloat16)
kk = jnp.asarray(rng.integers(0, K, (E,)), jnp.int32)
f1 = jnp.asarray(rng.standard_normal((memN, *cp.padded_hw(H1, W1), C)) * 0.3,
                 jnp.bfloat16)
f2 = jnp.asarray(rng.standard_normal((memN, *cp.padded_hw(30, 40), C)) * 0.3,
                 jnp.bfloat16)
coords = jnp.asarray(np.stack([rng.uniform(-5, W1 + 5, (E, 3, 3)),
                               rng.uniform(-5, 125, (E, 3, 3))], axis=1),
                     jnp.float32)
tf = jnp.sort(jnp.asarray(rng.integers(0, memN, (E // cp.TILE,)), jnp.int32))
kernel = jnp.asarray(rng.standard_normal((2 * cp.RAW_DIM, 384)) * 0.05,
                     jnp.float32)
w_enc = cp.map_enc_kernel(kernel).astype(jnp.bfloat16)
rows = jnp.asarray(cp.v12_row_map())
kz = jnp.concatenate([kernel, jnp.zeros((1, 384), kernel.dtype)])
kmap = kz[rows].astype(jnp.bfloat16)


@jax.jit
def pipeA(g_all, kk, f1, f2, coords, tf):
    g_pre = g_all[kk].reshape(E, cp.P2, C)
    feat = cp.corr_pallas_fused(g_pre, f1, f2, coords, tf,
                                out_dtype=jnp.bfloat16, version=12)
    return feat.reshape(E, -1) @ kmap


@jax.jit
def pipeB(g_all, kk, f1, f2, coords, tf):
    return cp.corr_pallas_enc(g_all, kk, w_enc, f1, f2, coords, tf,
                              out_dtype=jnp.bfloat16)


print("compiling B (v13 fused)...", flush=True)
b = np.asarray(pipeB(g_all, kk, f1, f2, coords, tf), np.float32)
print("compiling A (v12 pipeline)...", flush=True)
a = np.asarray(pipeA(g_all, kk, f1, f2, coords, tf), np.float32)
print("A vs B maxrel:", np.abs(a - b).max() / (np.abs(a).max() + 1e-9),
      flush=True)
timed("pipeB v13 fused", lambda tf: pipeB(g_all, kk, f1, f2, coords, tf),
      tf, reps=8)
timed("pipeA v12+gather+matmul",
      lambda tf: pipeA(g_all, kk, f1, f2, coords, tf), tf, reps=8)
