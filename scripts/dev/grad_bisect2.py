"""Narrow the zero-grad bug inside vonet_rollout itself."""
import numpy as np, jax, jax.numpy as jnp, optax
from dpvo_tpu.models.update import Update, DIM
from dpvo_tpu.training import rollout as R
from dpvo_tpu.ops import lie, corr as corr_ops

N, H, W, M, S = 5, 32, 48, 4, 3
h, w = H//4, W//4
K = N*M
update_mod = Update(3, dtype=jnp.float32)
key = jax.random.PRNGKey(0)
rng = np.random.default_rng(0)
sch = R.build_schedule(N, M, S, rng)
E = len(sch.ii)
u_params = update_mod.init(key, jnp.zeros((8,384)), jnp.zeros((8,384)),
    jnp.zeros((8,2*49*9)), jnp.zeros((8,),jnp.int32), jnp.zeros((8,),jnp.int32), jnp.zeros((8,),jnp.int32))

xi = jax.random.normal(key, (N,6))*0.05
xi = xi.at[:,0].add(jnp.arange(N)*0.1)
poses_gt = lie.se3_inv(lie.se3_exp(xi))
imap = jnp.asarray(rng.normal(size=(K, DIM)), jnp.float32)*0.1
gmap = jnp.asarray(rng.normal(size=(K, 3, 3, 128)), jnp.float32)*0.1
fmap1 = jnp.asarray(rng.normal(size=(N, h, w, 128)), jnp.float32)*0.1
fmap4 = corr_ops.avg_pool2d(fmap1, 4)
intr = jnp.tile(jnp.asarray([[40.,40.,w/2,h/2]]), (N,1))

cx = jnp.asarray(rng.uniform(2, w-2, (K,1,1)), jnp.float32)
cy = jnp.asarray(rng.uniform(2, h-2, (K,1,1)), jnp.float32)
off = jnp.arange(3, dtype=jnp.float32)-1
patches_gt = jnp.stack([jnp.broadcast_to(cx+off[None,None,:],(K,3,3)),
                        jnp.broadcast_to(cy+off[None,:,None],(K,3,3)),
                        jnp.broadcast_to(jnp.asarray(rng.uniform(0.5,1.5,(K,1,1)),jnp.float32),(K,3,3))],axis=1)
patches_init = patches_gt.at[:,2].set(jnp.asarray(rng.uniform(0.3,1.0,(K,1,1)),jnp.float32))

def mkloss(use_jit=True):
    fn = R.vonet_rollout
    if not use_jit:
        fn = fn.__wrapped__  # unwrap jax.jit
    def loss(p):
        out = fn(p, imap, gmap, fmap1, fmap4, patches_init, patches_gt,
                 poses_gt, intr, sch.ii, sch.jj, sch.kk, sch.active,
                 sch.fresh, sch.intro, update_mod=update_mod,
                 structure_only=False, steps=S, M=M)
        return jnp.sum(out["flow_err"])
    return loss

g1 = jax.grad(mkloss(True))(u_params)
print("rollout jit gnorm:", optax.global_norm(g1), flush=True)
g2 = jax.grad(mkloss(False))(u_params)
print("rollout nojit gnorm:", optax.global_norm(g2), flush=True)
