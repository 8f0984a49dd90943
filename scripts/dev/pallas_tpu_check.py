"""First real-TPU compile + correctness + timing of the Pallas corr kernel."""
import time, numpy as np, jax, jax.numpy as jnp
from dpvo_tpu.ops import corr as corr_ops
from dpvo_tpu.ops import corr_pallas as cp

log = open("/tmp/pallas_check.log", "a")
def p(*a):
    print(*a, flush=True); print(*a, file=log, flush=True)

rng = np.random.default_rng(0)
E, F, H, W, C = 2048, 8, 120, 160, 128
K = 512
gmap = jnp.asarray(rng.normal(size=(K, 3, 3, C)), jnp.bfloat16)
fmap = jnp.asarray(rng.normal(size=(F, H, W, C)), jnp.bfloat16)
coords = jnp.asarray(rng.uniform(8, 100, (E, 2, 3, 3)), jnp.float32)
kidx = jnp.asarray(rng.integers(0, K, E), jnp.int32)
n_tiles = E // cp.TILE
tf_np = np.sort(rng.integers(0, F, n_tiles)).astype(np.int32)
tf = jnp.asarray(tf_np)
fidx = jnp.repeat(tf, cp.TILE)
fpad = cp.pad_fmap(fmap)

t0 = time.time()
out = cp.corr_grouped(gmap, fpad, coords, kidx, tf)
jax.block_until_ready(out)
p(f"pallas compile+run: {time.time()-t0:.1f}s")

ref = corr_ops.corr(gmap, fmap, coords, kidx, fidx, radius=3)
err = float(jnp.abs(out - ref).max())
rel = float(jnp.abs(out - ref).mean() / jnp.abs(ref).mean())
p(f"max abs diff vs XLA: {err:.4f}, mean rel: {rel:.5f}")

# chained timing
@jax.jit
def chain(c):
    o = cp.corr_grouped(gmap, fpad, c, kidx, tf)
    return c + 1e-9 * jnp.mean(o), o

c = coords
_, o = chain(c); jax.block_until_ready(o)
t0 = time.time(); reps = 30
for _ in range(reps):
    c, o = chain(c)
jax.block_until_ready(o)
p(f"pallas corr chained E={E}: {(time.time()-t0)/reps*1000:.2f}ms")
