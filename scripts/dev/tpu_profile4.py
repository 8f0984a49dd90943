"""Profile the optimized update_step (pallas corr + sorted aggs + matmul
BA) on TPU, chained inputs."""
import time, sys, numpy as np, jax, jax.numpy as jnp
from dpvo_tpu.models.update import Update, DIM
from dpvo_tpu.engine import kernels
from dpvo_tpu.ops import scatter
from dpvo_tpu.ops.corr_pallas import TILE, PAD

E = int(sys.argv[1]) if len(sys.argv) > 1 else 49152
use_pallas = (sys.argv[2] != "xla") if len(sys.argv) > 2 else True
M, P = 96, 3
mem = pmem = 36
h, w = 120, 160
N = 256
dt = jnp.bfloat16
log = open("/tmp/profile4.log", "a")
def p(*a):
    print(*a, flush=True); print(*a, file=log, flush=True)

key = jax.random.PRNGKey(0)
rng = np.random.default_rng(0)
update_mod = Update(P, dtype=dt)
u_params = update_mod.init(key, jnp.zeros((8, DIM)), jnp.zeros((8, DIM)),
    jnp.zeros((8, 2*49*9)), jnp.zeros((8,), jnp.int32),
    jnp.zeros((8,), jnp.int32), jnp.zeros((8,), jnp.int32))

poses = jnp.zeros((N, 7)).at[:, 6].set(1.0)
patches = jnp.asarray(rng.uniform(1, 100, (N*M, 3, P, P)), jnp.float32)
intr = jnp.tile(jnp.asarray([[120., 120., 80., 60.]]), (N, 1))
imap = jnp.asarray(rng.normal(size=(pmem*M, DIM)), dt)
gmap = jnp.asarray(rng.normal(size=(pmem*M, P, P, 128)), dt)
fmap1 = jnp.asarray(rng.normal(size=(mem, h+2*PAD, w+2*PAD, 128)), dt)
fmap2 = jnp.asarray(rng.normal(size=(mem, h//4+2*PAD, w//4+2*PAD, 128)), dt)
net = jnp.zeros((E, DIM), jnp.float32)
ii = rng.integers(0, 24, E).astype(np.int32)
jj = rng.integers(0, 24, E).astype(np.int32)
kk = rng.integers(0, 24*M, E).astype(np.int32)
valid = jnp.ones((E,), bool)

# host metadata (mirrors engine)
def corr_grouping(jj_np, E_cap, Es):
    slots = jj_np % mem
    order = np.argsort(slots, kind="stable")
    ss = slots[order]
    perm = np.zeros(Es, np.int32); inv = np.zeros(E_cap, np.int32)
    tf = np.zeros(Es // TILE, np.int32)
    bounds = np.nonzero(np.diff(ss))[0] + 1
    pos = 0
    for g in np.split(order, bounds):
        slot = int(slots[g[0]]); cnt = len(g)
        perm[pos:pos+cnt] = g; inv[g] = np.arange(pos, pos+cnt)
        pad = (-cnt) % TILE
        perm[pos+cnt:pos+cnt+pad] = g[0]
        tf[pos//TILE:(pos+cnt+pad)//TILE] = slot
        pos += cnt + pad
    return jnp.asarray(perm), jnp.asarray(inv), jnp.asarray(tf)

Es = E + mem * TILE
t0 = time.time()
cperm, cinv, ctf = corr_grouping(jj, E, Es)
meta_kk = tuple(jnp.asarray(a) for a in scatter.group_meta(kk))
meta_ij = tuple(jnp.asarray(a) for a in scatter.group_meta(ii.astype(np.int64)*12345+jj))
p(f"host metadata: {(time.time()-t0)*1000:.1f}ms")

args = dict(update_mod=update_mod, M=M, pmem=pmem, mem=mem, n_cap=28,
            k_cap=4096, iterations=2, run_ba=True, use_pallas=use_pallas,
            corr_perm=cperm, corr_inv=cinv, tile_frame=ctf,
            agg_meta=(meta_kk, meta_ij))

iid, jjd, kkd = jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk)
t0 = time.time()
out = kernels.update_step(u_params, poses, patches, intr, imap, gmap,
    fmap1, fmap2, net, iid, jjd, kkd, valid, jnp.int32(1), jnp.int32(24),
    **args)
jax.block_until_ready(out)
p(f"update_step E={E} pallas={use_pallas} compile: {time.time()-t0:.1f}s")

net_c, _, _, _, poses_c, patches_c = out
t0 = time.time(); reps = 20
for _ in range(reps):
    out = kernels.update_step(u_params, poses_c, patches_c, intr, imap,
        gmap, fmap1, fmap2, net_c, iid, jjd, kkd, valid, jnp.int32(1),
        jnp.int32(24), **args)
    net_c, _, _, _, poses_c, patches_c = out
    jax.block_until_ready(poses_c)
p(f"update_step E={E} pallas={use_pallas} steady: {(time.time()-t0)/reps*1000:.1f}ms")
