"""Time compile + steady-state of each engine kernel on the real TPU."""
import time, numpy as np, jax, jax.numpy as jnp
import sys

from dpvo_tpu.models.vonet import Patchifier
from dpvo_tpu.models.update import Update, DIM
from dpvo_tpu.engine import kernels

E = int(sys.argv[1]) if len(sys.argv) > 1 else 49152
M, P = 96, 3
mem = pmem = 36
ht, wd = 480, 640
h, w = ht//4, wd//4
N = 256
dt = jnp.bfloat16

print(f"profiling E={E}", flush=True)
key = jax.random.PRNGKey(0)
patchifier = Patchifier(P, dtype=dt)
update_mod = Update(P, dtype=dt)

img = jax.random.normal(key, (ht, wd, 3))
crd = jax.random.uniform(key, (M, 2), minval=1, maxval=100)
t0 = time.time()
p_params = patchifier.init(key, img[None], crd[None])
out = kernels.process_frame(p_params, patchifier, img, crd)
jax.block_until_ready(out)
print(f"process_frame compile: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for _ in range(10):
    out = kernels.process_frame(p_params, patchifier, img, crd)
jax.block_until_ready(out)
print(f"process_frame steady: {(time.time()-t0)*100:.1f}ms", flush=True)

u_params = update_mod.init(key, jnp.zeros((8, DIM)), jnp.zeros((8, DIM)),
    jnp.zeros((8, 2*49*9)), jnp.zeros((8,), jnp.int32),
    jnp.zeros((8,), jnp.int32), jnp.zeros((8,), jnp.int32))

rng = np.random.default_rng(0)
poses = jnp.zeros((N, 7)).at[:, 6].set(1.0)
patches = jnp.asarray(rng.uniform(1, 100, (N*M, 3, P, P)), jnp.float32)
intr = jnp.tile(jnp.asarray([[120., 120., 80., 60.]]), (N, 1))
imap = jnp.asarray(rng.normal(size=(pmem*M, DIM)), dt)
gmap = jnp.asarray(rng.normal(size=(pmem*M, P, P, 128)), dt)
fmap1 = jnp.asarray(rng.normal(size=(mem, h, w, 128)), dt)
fmap2 = jnp.asarray(rng.normal(size=(mem, h//4, w//4, 128)), dt)
net = jnp.zeros((E, DIM), jnp.float32)
ii = jnp.asarray(rng.integers(0, 24, E), jnp.int32)
jj = jnp.asarray(rng.integers(0, 24, E), jnp.int32)
kk = jnp.asarray(rng.integers(0, 24*M, E), jnp.int32)
valid = jnp.ones((E,), bool)

def run_once():
    return kernels.update_step(u_params, poses, patches, intr, imap, gmap,
        fmap1, fmap2, net, ii, jj, kk, valid, jnp.int32(1), jnp.int32(24),
        update_mod=update_mod, M=M, pmem=pmem, mem=mem, n_cap=28,
        k_cap=4096, iterations=2, run_ba=True)

t0 = time.time()
out = run_once()
jax.block_until_ready(out)
print(f"update_step compile: {time.time()-t0:.1f}s", flush=True)

# donated args: chain state through calls like the real engine
net_c, _, _, _, poses_c, patches_c = out
t0 = time.time()
reps = 20
for _ in range(reps):
    out = kernels.update_step(u_params, poses_c, patches_c, intr,
        imap, gmap, fmap1, fmap2, net_c, ii, jj, kk, valid,
        jnp.int32(1), jnp.int32(24),
        update_mod=update_mod, M=M, pmem=pmem, mem=mem, n_cap=28,
        k_cap=4096, iterations=2, run_ba=True)
    net_c, _, _, _, poses_c, patches_c = out
    jax.block_until_ready(poses_c)
print(f"update_step steady: {(time.time()-t0)/reps*1000:.1f}ms", flush=True)
