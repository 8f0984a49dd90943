"""Break down update_step cost: corr vs network vs BA, on TPU."""
import time, sys, numpy as np, jax, jax.numpy as jnp
from functools import partial
from dpvo_tpu.models.update import Update, DIM
from dpvo_tpu.ops import corr as corr_ops, ba, projective as pops

E = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
M, P = 96, 3
mem = pmem = 36
h, w = 120, 160
dt = jnp.bfloat16
key = jax.random.PRNGKey(0)
rng = np.random.default_rng(0)

gmap = jnp.asarray(rng.normal(size=(pmem*M, P, P, 128)), dt)
fmap1 = jnp.asarray(rng.normal(size=(mem, h, w, 128)), dt)
fmap2 = jnp.asarray(rng.normal(size=(mem, h//4, w//4, 128)), dt)
coords2 = jnp.asarray(rng.uniform(10, 100, (E, 2, P, P)), jnp.float32)
kk = jnp.asarray(rng.integers(0, pmem*M, E), jnp.int32)
jjm = jnp.asarray(rng.integers(0, mem, E), jnp.int32)

def bench(name, f, *args):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time(); reps = 20
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/reps*1000:.1f}ms", flush=True)

corr1 = jax.jit(lambda g, f, c, k, j: corr_ops.corr(g, f, c, k, j, 3))
bench("corr lvl1", corr1, gmap, fmap1, coords2, kk, jjm)
bench("corr lvl2", corr1, gmap, fmap2, coords2/4, kk, jjm)

# network update
update_mod = Update(P, dtype=dt)
net = jnp.zeros((E, DIM), jnp.float32)
ctx = jnp.asarray(rng.normal(size=(E, DIM)), jnp.float32)
cf = jnp.asarray(rng.normal(size=(E, 2*49*9)), jnp.float32)
ii = jnp.asarray(rng.integers(0, 24, E), jnp.int32)
jj = jnp.asarray(rng.integers(0, 24, E), jnp.int32)
valid = jnp.ones((E,), bool)
u_params = update_mod.init(key, net, ctx, cf, ii, jj, kk)
upd = jax.jit(lambda p, n, c, f: update_mod.apply(p, n, c, f, ii, jj, kk, valid))
bench("update net", upd, u_params, net, ctx, cf)

# BA
N = 256
poses = jnp.zeros((N, 7)).at[:, 6].set(1.0)
patches = jnp.asarray(rng.uniform(1, 100, (N*M, 3, P, P)), jnp.float32)
intr = jnp.asarray([120., 120., 80., 60.])
kk_ba = jnp.asarray(rng.integers(0, 24*M, E), jnp.int32)
target = jnp.asarray(rng.uniform(0, 150, (E, 2)), jnp.float32)
bafn = partial(ba.ba_iterative, n_cap=28, k_cap=4096, iterations=2)
bench("BA 2iter", lambda: bafn(poses, patches, intr, target,
    jnp.ones((E,2)), jnp.float32(1e-4), ii, jj, kk_ba, valid,
    jnp.int32(1), jnp.int32(24)))

# reproject
bench("reproject", jax.jit(lambda: pops.transform(poses, patches,
    jnp.tile(intr[None], (N,1)), ii, jj, kk_ba)))
