import numpy as np, jax, jax.numpy as jnp
from dpvo_tpu.models.update import Update, DIM
from dpvo_tpu.ops import lie, projective as pops, ba, corr as corr_ops
import optax

E, K, N, M, P = 64, 20, 5, 4, 3
key = jax.random.PRNGKey(0)
update_mod = Update(P, dtype=jnp.float32)
ii = jnp.asarray(np.random.default_rng(0).integers(0, N, E), jnp.int32)
jj = jnp.asarray(np.random.default_rng(1).integers(0, N, E), jnp.int32)
kk = jnp.asarray(np.random.default_rng(2).integers(0, K, E), jnp.int32)
active = jnp.ones((E,), bool)
net = jnp.zeros((E, DIM))
ctx = jax.random.normal(key, (E, DIM))*0.1
corr_feat = jax.random.normal(key, (E, 2*49*9))*0.1
u_params = update_mod.init(key, net, ctx, corr_feat, ii, jj, kk)

# a) grad through update only
def la(p):
    n2, d, w = update_mod.apply(p, net, ctx, corr_feat, ii, jj, kk, active)
    return jnp.sum(d**2) + jnp.sum(w)
ga = jax.grad(la)(u_params)
print("a) update-only gnorm:", optax.global_norm(ga), flush=True)

# b) grad through update + BA -> poses
xi = jax.random.normal(key, (N,6))*0.05
xi = xi.at[:,0].add(jnp.arange(N)*0.1)
poses = lie.se3_exp(xi)
rngg = np.random.default_rng(3)
cx = jnp.asarray(rngg.uniform(20,100,(K,1,1))); cy = jnp.asarray(rngg.uniform(15,90,(K,1,1)))
d0 = jnp.asarray(rngg.uniform(0.5,1.5,(K,1,1)))
off = jnp.arange(P, dtype=jnp.float32)-1
patches = jnp.stack([jnp.broadcast_to(cx+off[None,None,:],(K,P,P)),
                     jnp.broadcast_to(cy+off[None,:,None],(K,P,P)),
                     jnp.broadcast_to(d0,(K,P,P))],axis=1).astype(jnp.float32)
intr = jnp.tile(jnp.asarray([[120.,120.,80.,60.]]),(N,1))
bounds = jnp.asarray([-64.,-64.,224.,184.])

def lb(p):
    coords = pops.transform(poses, patches, intr, ii, jj, kk)
    n2, delta, w = update_mod.apply(p, net, ctx, corr_feat, ii, jj, kk, active)
    target = coords[:,1,1] + delta
    Gs, pat = poses, patches
    for _ in range(2):
        Gs, pat = ba.ba_differentiable(Gs, pat, intr, target, w, 1e-4,
            ii, jj, kk, active, bounds, ep=10.0, fixedp=1, k_cap=K)
    c2 = pops.transform(Gs, pat, intr, ii, jj, kk)
    return jnp.sum(c2[:,1,1]**2)*1e-6
gb = jax.grad(lb)(u_params)
print("b) update+BA gnorm:", optax.global_norm(gb), flush=True)

# c) same inside scan with checkpoint
def step(carry, _):
    Gs, pat = carry
    Gs = jax.lax.stop_gradient(Gs); pat = jax.lax.stop_gradient(pat)
    return (Gs, pat), None

def lc(p):
    def stp(carry, _):
        Gs, pat, nn = carry
        Gs = jax.lax.stop_gradient(Gs); pat = jax.lax.stop_gradient(pat)
        coords = pops.transform(Gs, pat, intr, ii, jj, kk)
        nn, delta, w = update_mod.apply(p, nn, ctx, corr_feat, ii, jj, kk, active)
        target = coords[:,1,1] + delta
        for _ in range(2):
            Gs, pat = ba.ba_differentiable(Gs, pat, intr, target, w, 1e-4,
                ii, jj, kk, active, bounds, ep=10.0, fixedp=1, k_cap=K)
        c2 = pops.transform(Gs, pat, intr, ii, jj, kk)
        return (Gs, pat, nn), jnp.sum(c2[:,1,1]**2)*1e-6
    (_,_,_), errs = jax.lax.scan(jax.checkpoint(stp), (poses, patches, net), None, length=3)
    return jnp.sum(errs)
gc = jax.grad(lc)(u_params)
print("c) scan+checkpoint gnorm:", optax.global_norm(gc), flush=True)
