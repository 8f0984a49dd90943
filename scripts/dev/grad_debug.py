"""Dev script: check gradient flow through the training rollout."""
import numpy as np, jax, jax.numpy as jnp
from dpvo_tpu.models.vonet import Patchifier
from dpvo_tpu.models.update import Update
from dpvo_tpu.training import rollout as R
from dpvo_tpu.ops import lie, corr as corr_ops

B, N, H, W, M, S = 1, 5, 32, 48, 4, 3
h, w = H//4, W//4
K = N*M
patchifier = Patchifier(3, dtype=jnp.float32)
update_mod = Update(3, dtype=jnp.float32)
key = jax.random.PRNGKey(0)
p_params = patchifier.init(key, jnp.zeros((N,H,W,3)), jnp.ones((N,M,2))*4)
u_params = update_mod.init(key, jnp.zeros((8,384)), jnp.zeros((8,384)),
    jnp.zeros((8,2*49*9)), jnp.zeros((8,),jnp.int32), jnp.zeros((8,),jnp.int32), jnp.zeros((8,),jnp.int32))
params = {"patchify": p_params, "update": u_params}
rng = np.random.default_rng(0)
sch = R.build_schedule(N, M, S, rng)

xi = jax.random.normal(key, (N,6))*0.05
xi = xi.at[:,0].add(jnp.arange(N)*0.1)
poses_gt = lie.se3_inv(lie.se3_exp(xi))

images = jnp.asarray(rng.normal(size=(N,H,W,3)), jnp.float32)
disps = jnp.ones((N,h,w), jnp.float32)
intr = jnp.tile(jnp.asarray([[40.,40.,w/2,h/2]]), (N,1))
coords = jnp.asarray(rng.uniform(2, min(h,w)-2, (N,M,2)), jnp.float32)
depth_init = jnp.asarray(rng.uniform(0.5,2.0,(K,)), jnp.float32)

def loss_fn(params):
    fmap, gmap, imap, patches_gt, _, _ = patchifier.apply(params["patchify"], images, coords, disps=disps)
    fmap4 = corr_ops.avg_pool2d(fmap, 4)
    Pp = 3
    patches_gt = patches_gt.reshape(K,3,Pp,Pp)
    gmap = gmap.reshape(K,Pp,Pp,-1); imap = imap.reshape(K,-1)
    patches_init = patches_gt.at[:,2].set(jnp.broadcast_to(depth_init[:,None,None],(K,Pp,Pp)))
    out = R.vonet_rollout(params["update"], imap, gmap, fmap, fmap4,
        patches_init, patches_gt, poses_gt, intr,
        sch.ii, sch.jj, sch.kk, sch.active, sch.fresh, sch.intro,
        update_mod=update_mod, structure_only=False, steps=S, M=M)
    tr, ro, _ = R.pose_loss_terms(out["poses"], poses_gt)
    return 0.1*jnp.sum(out["flow_err"]) + 10.0*jnp.sum((tr+ro)*(jnp.arange(S)>=2)), (out, tr, ro)

(loss, (out, tr, ro)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
print("loss", loss, "tr", tr, "ro", ro)
print("flow_err", out["flow_err"])
import optax
print("gnorm total", optax.global_norm(grads))
flat = jax.tree_util.tree_flatten_with_path(grads)[0]
nz = [(jax.tree_util.keystr(k), float(jnp.abs(v).max())) for k,v in flat]
nz.sort(key=lambda x: -x[1])
print("top grads:", nz[:5])
print("zero count:", sum(1 for _,v in nz if v == 0), "/", len(nz))
