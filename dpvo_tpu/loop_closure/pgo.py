"""Sim3 pose-graph optimization (classic loop-closure backend).

Rebuild of the reference's LM pose-graph solver
(ref loop_closure/optim_utils.py:152-243 + the Eigen sparse CPU solver in
fastba/ba.cpp:102-180).  Variables are per-pose Sim3 tangent vectors of
the inverse poses; constraints are consecutive-pose odometry factors plus
Sim3 loop factors.

TPU-native design: per-edge 7x7 Jacobians come from one vmapped
``jax.jacfwd`` (the reference uses torch.autograd.functional.jacobian),
and the damped normal equations are solved matrix-free with conjugate
gradients + block-Jacobi preconditioner (the reference builds an Eigen
sparse matrix and factorizes on CPU).  The LM accept/reject loop stays on
the host like the reference's.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import lie


def se3_to_sim3_log_inv(poses_se3):
    """SE3 poses (n, 7) -> Sim3 log of their inverses (n, 7 tangent)."""
    sim = lie.se3_to_sim3(poses_se3)
    return lie.sim3_log(lie.sim3_inv(sim))


def _edge_residual(C, gi, gj):
    """r = log(C * exp(gi) * exp(gj)^-1)  (ref optim_utils.py:158-161)."""
    return lie.sim3_log(
        lie.sim3_mul(C, lie.sim3_mul(lie.sim3_exp(gi),
                                     lie.sim3_inv(lie.sim3_exp(gj)))))


@jax.jit
def _residuals(Ginv, constants, iii, jjj):
    return jax.vmap(_edge_residual)(constants, Ginv[iii], Ginv[jjj])


@jax.jit
def _residuals_and_jac(Ginv, constants, iii, jjj):
    r = jax.vmap(_edge_residual)(constants, Ginv[iii], Ginv[jjj])
    Ji = jax.vmap(jax.jacfwd(_edge_residual, argnums=1))(
        constants, Ginv[iii], Ginv[jjj])
    Jj = jax.vmap(jax.jacfwd(_edge_residual, argnums=2))(
        constants, Ginv[iii], Ginv[jjj])
    return r, Ji, Jj


@partial(jax.jit, static_argnames=("n", "cg_iters"))
def _gn_step(r, Ji, Jj, iii, jjj, n, lmbda, ep, cg_iters=100):
    """Solve (J^T J + (lmbda + ep) I) dx = -J^T r matrix-free with CG."""
    seg = partial(jax.ops.segment_sum, num_segments=n)

    def Jx(x):                      # (n, 7) -> (r, 7)
        return (jnp.einsum("eab,eb->ea", Ji, x[iii])
                + jnp.einsum("eab,eb->ea", Jj, x[jjj]))

    def JTy(y):                     # (r, 7) -> (n, 7)
        return (seg(jnp.einsum("eab,ea->eb", Ji, y), iii)
                + seg(jnp.einsum("eab,ea->eb", Jj, y), jjj))

    damp = lmbda + ep

    def A(x):
        return JTy(Jx(x)) + damp * x

    b = -JTy(r)

    # block-Jacobi preconditioner: inverse of per-pose 7x7 diagonal blocks
    Di = seg(jnp.einsum("eab,eac->ebc", Ji, Ji), iii)
    Dj = seg(jnp.einsum("eab,eac->ebc", Jj, Jj), jjj)
    D = Di + Dj + damp * jnp.eye(7)[None]
    Dinv = jnp.linalg.inv(D + 1e-8 * jnp.eye(7)[None])

    def M(x):
        return jnp.einsum("nab,nb->na", Dinv, x)

    dx, _ = jax.scipy.sparse.linalg.cg(A, b, M=M, maxiter=cg_iters,
                                       tol=1e-8)
    return dx


def perform_updates(poses_se3, dSloop, ii_loop, jj_loop, iters=30,
                    ep=0.0, lmbda=1e-6):
    """LM loop (ref optim_utils.py:211-243).

    poses_se3 (n, 7) numpy; dSloop (L, 8) Sim3 constraints;
    ii_loop/jj_loop (L,).  Returns corrected Sim3 poses (n, 8)
    (exp(Ginv)^-1, i.e. world-from-camera inverses undone).
    """
    # pad the pose count to a power-of-two bucket: every call would
    # otherwise compile a fresh program for its exact n (minutes each on
    # a remote-compile backend).  Padding poses are identity with
    # identity odometry constraints -> zero residuals, no coupling.
    poses_np = np.asarray(poses_se3, np.float32)
    n_real = len(poses_np)
    n_bucket = 1 << int(np.ceil(np.log2(max(n_real, 64))))
    if n_bucket > n_real:
        pad = np.zeros((n_bucket - n_real, 7), np.float32)
        pad[:, 6] = 1.0
        poses_np = np.concatenate([poses_np, pad])
    poses_se3 = jnp.asarray(poses_np, jnp.float32)
    n = poses_se3.shape[0]

    pred_inv = lie.sim3_inv(lie.se3_to_sim3(poses_se3))
    Ginv = lie.sim3_log(pred_inv)

    # odometry constants: dSij = Tj * Ti^-1 for consecutive (k, k-1)
    kk = jnp.arange(1, n)
    ll = kk - 1
    Ti = pred_inv[kk]
    Tj = pred_inv[ll]
    dSij = lie.sim3_mul(Tj, lie.sim3_inv(Ti))

    constants = jnp.concatenate([dSij, jnp.asarray(dSloop, jnp.float32)])
    iii = jnp.concatenate([kk, jnp.asarray(ii_loop, jnp.int32)])
    jjj = jnp.concatenate([ll, jnp.asarray(jj_loop, jnp.int32)])

    history = []
    for itr in range(iters):
        r, Ji, Jj = _residuals_and_jac(Ginv, constants, iii, jjj)
        history.append(float(jnp.mean(r ** 2)))

        dx = _gn_step(r, Ji, Jj, iii, jjj, n, jnp.float32(lmbda),
                      jnp.float32(ep))
        Ginv_tmp = Ginv + dx

        new_r = _residuals(Ginv_tmp, constants, iii, jjj)
        if float(jnp.mean(new_r ** 2)) < history[-1]:
            Ginv = Ginv_tmp
            lmbda /= 2
        else:
            lmbda *= 2

        if (history[-1] < 1e-5 and itr >= 4
                and history[-5] / max(history[-1], 1e-12) < 1.5):
            break

    return lie.sim3_inv(lie.sim3_exp(Ginv))[:n_real]


def run_pgo(pred_poses, dSloop, loop_ii, loop_jj, queue=None, iters=30):
    """Worker entry (ref optim_utils.py:202-209): optimize, gauge-fix to
    the first pose after the loop region, return poses up to it."""
    final = perform_updates(pred_poses, dSloop, loop_ii, loop_jj, iters)

    safe_i = int(np.max(loop_ii)) + 1
    orig = lie.se3_to_sim3(jnp.asarray(pred_poses, jnp.float32))
    fix = lie.sim3_mul(orig[safe_i], lie.sim3_inv(final[safe_i]))
    final = lie.sim3_mul(fix[None], final)
    out = np.asarray(final[:safe_i])
    if queue is not None:
        queue.put(out)
    return out
