"""Chained-input profiling (defeats any remote result caching)."""
import time, sys, numpy as np, jax, jax.numpy as jnp
from functools import partial
from dpvo_tpu.models.update import Update, DIM
from dpvo_tpu.ops import corr as corr_ops, ba

E = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
M, P = 96, 3
mem = pmem = 36
h, w = 120, 160
dt = jnp.bfloat16
key = jax.random.PRNGKey(0)
rng = np.random.default_rng(0)
log = open("/tmp/profile3.log", "a")
def p(*a):
    print(*a, flush=True)
    print(*a, file=log, flush=True)

gmap = jnp.asarray(rng.normal(size=(pmem*M, P, P, 128)), dt)
fmap1 = jnp.asarray(rng.normal(size=(mem, h, w, 128)), dt)
coords2 = jnp.asarray(rng.uniform(10, 100, (E, 2, P, P)), jnp.float32)
kk = jnp.asarray(rng.integers(0, pmem*M, E), jnp.int32)
jjm = jnp.asarray(rng.integers(0, mem, E), jnp.int32)

# chained corr: feed a reduction of output back into coords
@jax.jit
def corr_chain(c):
    out = corr_ops.corr(gmap, fmap1, c, kk, jjm, 3)
    return c + 1e-9 * jnp.mean(out), out

c = coords2
_, out = corr_chain(c); jax.block_until_ready(out)
t0 = time.time(); reps = 20
for _ in range(reps):
    c, out = corr_chain(c)
jax.block_until_ready(out)
p(f"corr lvl1 chained E={E}: {(time.time()-t0)/reps*1000:.2f}ms")

# chained BA
N = 256
poses = jnp.zeros((N, 7)).at[:, 6].set(1.0)
patches = jnp.asarray(rng.uniform(1, 100, (N*M, 3, P, P)), jnp.float32)
intr = jnp.asarray([120., 120., 80., 60.])
ii = jnp.asarray(rng.integers(0, 24, E), jnp.int32)
jj2 = jnp.asarray(rng.integers(0, 24, E), jnp.int32)
kk_ba = jnp.asarray(rng.integers(0, 24*M, E), jnp.int32)
target = jnp.asarray(rng.uniform(0, 150, (E, 2)), jnp.float32)
valid = jnp.ones((E,), bool)

pp, pt = poses, patches
pp, pt = ba.ba_iterative(pp, pt, intr, target, jnp.ones((E,2)),
    jnp.float32(1e-4), ii, jj2, kk_ba, valid, jnp.int32(1), jnp.int32(24),
    n_cap=28, k_cap=4096, iterations=2)
jax.block_until_ready(pt)
t0 = time.time()
for _ in range(reps):
    pp, pt = ba.ba_iterative(pp, pt, intr, target, jnp.ones((E,2)),
        jnp.float32(1e-4), ii, jj2, kk_ba, valid, jnp.int32(1), jnp.int32(24),
        n_cap=28, k_cap=4096, iterations=2)
    jax.block_until_ready(pt)
p(f"BA 2iter chained E={E}: {(time.time()-t0)/reps*1000:.2f}ms")

# update chained
update_mod = Update(P, dtype=dt)
ctx = jnp.asarray(rng.normal(size=(E, DIM)), jnp.float32)
cf = jnp.asarray(rng.normal(size=(E, 2*49*9)), jnp.float32)
net = jnp.zeros((E, DIM), jnp.float32)
u_params = update_mod.init(key, net, ctx, cf, ii, jj2, kk)
upd = jax.jit(lambda n, c, f: update_mod.apply(u_params, n, c, f, ii, jj2, kk, valid))
n_, d_, w_ = upd(net, ctx, cf); jax.block_until_ready(n_)
t0 = time.time()
for _ in range(reps):
    n_, d_, w_ = upd(n_, ctx, cf)
jax.block_until_ready(n_)
p(f"update chained E={E}: {(time.time()-t0)/reps*1000:.2f}ms")
