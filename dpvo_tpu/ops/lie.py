"""Pure-JAX Lie groups: SO(3), RxSO(3), SE(3), Sim(3).

TPU-native replacement for the reference's lietorch C++/CUDA extension
(ref: methods/dpvo/dpvo/lietorch/include/{so3,rxso3,se3,sim3}.h and
src/lietorch_{cpu,gpu}.{cpp,cu}).  Instead of one-thread-per-element CUDA
kernels with hand-written analytic gradients, every op here is a small
closed-form jnp function: XLA fuses the elementwise math, `vmap` handles
batching, and autodiff supplies exact gradients (the reference's forced
fp32 compute discipline — lietorch/group_ops.py:6-37 — is kept by casting
inputs to float32 on entry).

Conventions
-----------
- Quaternions are ``[x, y, z, w]`` (scalar-last, matching the reference).
- Group elements are flat arrays on the last axis:
    SO3   (..., 4)  = q
    RxSO3 (..., 5)  = [q, s]
    SE3   (..., 7)  = [t, q]
    Sim3  (..., 8)  = [t, q, s]
- Tangent vectors:
    so3   (..., 3)  = phi
    rxso3 (..., 4)  = [phi, sigma]
    se3   (..., 6)  = [tau, phi]
    sim3  (..., 7)  = [tau, phi, sigma]
- All functions broadcast over leading axes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8
_F32 = jnp.float32


def _f32(*xs):
    """Promote to the compute dtype: float64 stays float64 (the reference
    dispatches double kernels for double inputs — lietorch dispatch.h:36-44,
    run_tests.py gradchecks run in double), everything else becomes float32
    (the forced-fp32 discipline of group_ops.py:6-37 for half inputs)."""
    def cast(x):
        x = jnp.asarray(x)
        if x.dtype == jnp.float64:
            return x
        return x.astype(_F32)
    out = tuple(cast(x) for x in xs)
    return out if len(out) > 1 else out[0]


# All matmuls in this module are tiny geometry contractions that MUST run in
# true fp32: JAX's default matmul precision on TPU (and its CPU emulation)
# downcasts fp32 matmul inputs to bf16, which destroys pose accuracy.
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def _mv(m, v):
    return jnp.einsum("...ij,...j->...i", m, v, precision=_HI)


def _mtv(m, v):
    return jnp.einsum("...ji,...j->...i", m, v, precision=_HI)


# ---------------------------------------------------------------------------
# Quaternion primitives
# ---------------------------------------------------------------------------

def quat_mul(q1, q2):
    """Hamilton product, scalar-last layout."""
    x1, y1, z1, w1 = jnp.split(q1, 4, axis=-1)
    x2, y2, z2, w2 = jnp.split(q2, 4, axis=-1)
    return jnp.concatenate([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ], axis=-1)


def quat_conj(q):
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4)."""
    qv = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (w * uv + uuv)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)


def quat_to_matrix(q):
    """(..., 4) -> (..., 3, 3) rotation matrix."""
    x, y, z, w = jnp.split(q, 4, axis=-1)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return r.reshape(q.shape[:-1] + (3, 3))


def skew(v):
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    o = jnp.zeros_like(v[..., 0])
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def so3_exp(phi):
    """so3 (..., 3) -> unit quaternion (..., 4)."""
    phi = _f32(phi)
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < 1e-8
    # "double where": keep the unselected branch NaN-free so autodiff
    # through jnp.where stays finite at phi = 0.
    ts_safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(ts_safe)
    half = 0.5 * theta
    # sin(theta/2)/theta with Taylor fallback: 1/2 - theta^2/48
    k = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([k * phi, w], axis=-1)


def so3_log(q):
    """Unit quaternion (..., 4) -> so3 (..., 3)."""
    q = _f32(q)
    qv = q[..., :3]
    w = q[..., 3:4]
    n_sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    small = n_sq < 1e-8
    n = jnp.sqrt(jnp.where(small, 1.0, n_sq))
    # angle in [0, pi]; handle w<0 via atan2 sign
    theta = 2.0 * jnp.arctan2(n, jnp.abs(w))
    sign = jnp.where(w < 0, -1.0, 1.0)
    # small-angle: log ~= 2 qv / w  (w ~= 1)
    k = jnp.where(small, 2.0 / jnp.abs(w).clip(_EPS), theta / n)
    return sign * k * qv


def so3_inv(q):
    return quat_conj(_f32(q))


def so3_mul(q1, q2):
    return quat_mul(*_f32(q1, q2))


def so3_act(q, p):
    return quat_rotate(*_f32(q, p))


def so3_matrix(q):
    """SO3 as 4x4 homogeneous matrix (parity with lietorch .matrix())."""
    q = _f32(q)
    R = quat_to_matrix(q)
    m = jnp.zeros(q.shape[:-1] + (4, 4), dtype=q.dtype)
    m = m.at[..., :3, :3].set(R)
    return m.at[..., 3, 3].set(1.0)


def so3_adj(q):
    """Adjoint of SO3 = rotation matrix (..., 3, 3)."""
    return quat_to_matrix(_f32(q))


def _so3_left_jacobian(phi):
    """V(phi): integrates translation for SE3 exp. (..., 3) -> (..., 3, 3)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    small = theta_sq < 1e-8
    ts_safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(ts_safe)
    Phi = skew(phi)
    Phi2 = _mm(Phi, Phi)
    a = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1.0 - jnp.cos(theta)) / ts_safe)
    b = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0,
                  (theta - jnp.sin(theta)) / (ts_safe * theta))
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye + a * Phi + b * Phi2


def _so3_left_jacobian_inv(phi):
    theta_sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    small = theta_sq < 1e-8
    ts_safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(ts_safe)
    Phi = skew(phi)
    Phi2 = _mm(Phi, Phi)
    half_theta = 0.5 * theta
    # (1 - theta/2 * cot(theta/2)) / theta^2
    cot_term = half_theta * jnp.cos(half_theta) / jnp.sin(half_theta).clip(_EPS)
    b = jnp.where(small, 1.0 / 12.0 + theta_sq / 720.0,
                  (1.0 - cot_term) / ts_safe)
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye - 0.5 * Phi + b * Phi2


# ---------------------------------------------------------------------------
# SE(3): data = [t (3), q (4)]
# ---------------------------------------------------------------------------

def se3_identity(shape=()):
    if isinstance(shape, int):
        shape = (shape,)
    g = jnp.zeros(tuple(shape) + (7,), dtype=_F32)
    return g.at[..., 6].set(1.0)


def se3_exp(xi):
    """se3 (..., 6) [tau, phi] -> SE3 (..., 7)."""
    xi = _f32(xi)
    tau, phi = xi[..., :3], xi[..., 3:6]
    q = so3_exp(phi)
    V = _so3_left_jacobian(phi)
    t = _mv(V, tau)
    return jnp.concatenate([t, q], axis=-1)


def se3_log(g):
    """SE3 (..., 7) -> se3 (..., 6)."""
    g = _f32(g)
    t, q = g[..., :3], g[..., 3:7]
    phi = so3_log(q)
    Vinv = _so3_left_jacobian_inv(phi)
    tau = _mv(Vinv, t)
    return jnp.concatenate([tau, phi], axis=-1)


def se3_inv(g):
    g = _f32(g)
    t, q = g[..., :3], g[..., 3:7]
    qi = quat_conj(q)
    ti = -quat_rotate(qi, t)
    return jnp.concatenate([ti, qi], axis=-1)


def se3_mul(g1, g2):
    g1, g2 = _f32(g1, g2)
    t1, q1 = g1[..., :3], g1[..., 3:7]
    t2, q2 = g2[..., :3], g2[..., 3:7]
    q = quat_mul(q1, q2)
    t = t1 + quat_rotate(q1, t2)
    return jnp.concatenate([t, q], axis=-1)


def se3_act(g, p):
    """Apply SE3 to 3D points (..., 3)."""
    g, p = _f32(g, p)
    return quat_rotate(g[..., 3:7], p) + g[..., :3]


def se3_act4(g, p4):
    """Apply SE3 to homogeneous points (..., 4): [R p + W t, W].

    Matches lietorch's act4 used throughout projective_ops (the 4th
    coordinate W scales translation; for patch lifts W = inverse depth).
    """
    g, p4 = _f32(g, p4)
    xyz = quat_rotate(g[..., 3:7], p4[..., :3]) + p4[..., 3:4] * g[..., :3]
    return jnp.concatenate([xyz, p4[..., 3:4]], axis=-1)


def se3_matrix(g):
    """SE3 (..., 7) -> homogeneous 4x4 matrix."""
    g = _f32(g)
    R = quat_to_matrix(g[..., 3:7])
    m = jnp.zeros(g.shape[:-1] + (4, 4), dtype=g.dtype)
    m = m.at[..., :3, :3].set(R)
    m = m.at[..., :3, 3].set(g[..., :3])
    return m.at[..., 3, 3].set(1.0)


def se3_adj_matrix(g):
    """Adjoint (..., 6, 6) in [tau, phi] block order: [[R, [t]x R], [0, R]]."""
    g = _f32(g)
    R = quat_to_matrix(g[..., 3:7])
    tR = _mm(skew(g[..., :3]), R)
    z = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([z, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_adj(g, a):
    """Adjoint action on tangent vectors a (..., 6)."""
    return _mv(se3_adj_matrix(g), _f32(a))


def se3_adjT(g, a):
    """Transpose-adjoint action on cotangent vectors a (..., 6).

    Matches lietorch ``Gij.adjT(Jj)`` (used for Ji = -adjT(Jj) in
    projective_ops.transform, ref projective_ops.py:104).
    """
    g, a = _f32(g, a)
    return _mtv(se3_adj_matrix(g), a)


def se3_retr(g, xi):
    """Retraction: exp(xi) * g  (matches retrSE3, ba_cuda.cu:164-174)."""
    return se3_mul(se3_exp(xi), g)


def se3_scale(g, s):
    """Scale translation part (lietorch SE3.scale, used for delta rescale)."""
    g = _f32(g)
    return jnp.concatenate([g[..., :3] * jnp.asarray(s, g.dtype)[..., None],
                            g[..., 3:7]], axis=-1)


# ---------------------------------------------------------------------------
# RxSO(3): data = [q (4), s (1)]
# ---------------------------------------------------------------------------

def rxso3_exp(xi):
    """(..., 4) [phi, sigma] -> (..., 5) [q, s]."""
    xi = _f32(xi)
    q = so3_exp(xi[..., :3])
    s = jnp.exp(xi[..., 3:4])
    return jnp.concatenate([q, s], axis=-1)


def rxso3_log(g):
    g = _f32(g)
    phi = so3_log(g[..., :4])
    sigma = jnp.log(g[..., 4:5].clip(_EPS))
    return jnp.concatenate([phi, sigma], axis=-1)


def rxso3_inv(g):
    g = _f32(g)
    return jnp.concatenate([quat_conj(g[..., :4]), 1.0 / g[..., 4:5]], axis=-1)


def rxso3_mul(g1, g2):
    g1, g2 = _f32(g1, g2)
    return jnp.concatenate([quat_mul(g1[..., :4], g2[..., :4]),
                            g1[..., 4:5] * g2[..., 4:5]], axis=-1)


def rxso3_act(g, p):
    g, p = _f32(g, p)
    return g[..., 4:5] * quat_rotate(g[..., :4], p)


# ---------------------------------------------------------------------------
# Sim(3): data = [t (3), q (4), s (1)]
# ---------------------------------------------------------------------------

def sim3_identity(shape=()):
    if isinstance(shape, int):
        shape = (shape,)
    g = jnp.zeros(tuple(shape) + (8,), dtype=_F32)
    return g.at[..., 6].set(1.0).at[..., 7].set(1.0)


def _sim3_calcW(phi, sigma):
    """W matrix integrating translation for Sim3 exp (ref sim3.h:145-170)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    small_t = theta_sq < 1e-8
    theta = jnp.sqrt(jnp.where(small_t, 1.0, theta_sq))
    sig = sigma[..., None]
    scale = jnp.exp(sig)
    Phi = skew(phi)
    Phi2 = _mm(Phi, Phi)

    small_theta = theta_sq < 1e-8
    small_sigma = jnp.abs(sig) < 1e-5

    # C = (scale - 1) / sigma, -> 1 when sigma -> 0
    C = jnp.where(small_sigma, 1.0 + 0.5 * sig, (scale - 1.0) / jnp.where(small_sigma, 1.0, sig))

    # Coefficients a (for Phi) and b (for Phi2); see Sophus/lietorch sim3.
    sig_safe = jnp.where(small_sigma, 1.0, sig)
    th_safe = jnp.where(small_theta, 1.0, theta)
    denom = sig_safe * sig_safe + theta_sq

    sin_t, cos_t = jnp.sin(th_safe), jnp.cos(th_safe)

    # general case
    a_gen = (sig_safe * sin_t + (1.0 - scale * cos_t) * th_safe) / (th_safe * denom)
    b_gen = (C - ((scale * cos_t - 1.0) * sig_safe
                  + scale * sin_t * th_safe) / denom) \
        / jnp.where(small_theta, 1.0, theta_sq)

    # sigma -> 0
    ts2 = jnp.where(small_theta, 1.0, theta_sq)
    a_s0 = (1.0 - cos_t) / ts2
    b_s0 = (th_safe - sin_t) / (ts2 * th_safe)

    # theta -> 0 (sigma general)
    a_t0 = ((sig_safe - 1.0) * scale + 1.0) / (sig_safe * sig_safe)
    b_t0 = (scale * 0.5 * sig_safe * sig_safe + scale - 1.0 - sig_safe * scale) / (sig_safe * sig_safe * sig_safe)

    # both small
    a_00 = 0.5 + sig / 6.0
    b_00 = 1.0 / 6.0 + sig / 24.0

    a = jnp.where(small_theta, jnp.where(small_sigma, a_00, a_t0),
                  jnp.where(small_sigma, a_s0, a_gen))
    b = jnp.where(small_theta, jnp.where(small_sigma, b_00, b_t0),
                  jnp.where(small_sigma, b_s0, b_gen))

    eye = jnp.eye(3, dtype=phi.dtype)
    return C * eye + a * Phi + b * Phi2


def sim3_exp(xi):
    """(..., 7) [tau, phi, sigma] -> Sim3 (..., 8)."""
    xi = _f32(xi)
    tau, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6:7]
    q = so3_exp(phi)
    s = jnp.exp(sigma)
    W = _sim3_calcW(phi, sigma)
    t = _mv(W, tau)
    return jnp.concatenate([t, q, s], axis=-1)


def sim3_log(g):
    g = _f32(g)
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    phi = so3_log(q)
    sigma = jnp.log(s.clip(_EPS))
    W = _sim3_calcW(phi, sigma)
    tau = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([tau, phi, sigma], axis=-1)


def sim3_inv(g):
    g = _f32(g)
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    qi = quat_conj(q)
    si = 1.0 / s
    ti = -si * quat_rotate(qi, t)
    return jnp.concatenate([ti, qi, si], axis=-1)


def sim3_mul(g1, g2):
    g1, g2 = _f32(g1, g2)
    t1, q1, s1 = g1[..., :3], g1[..., 3:7], g1[..., 7:8]
    t2, q2, s2 = g2[..., :3], g2[..., 3:7], g2[..., 7:8]
    q = quat_mul(q1, q2)
    s = s1 * s2
    t = t1 + s1 * quat_rotate(q1, t2)
    return jnp.concatenate([t, q, s], axis=-1)


def sim3_act(g, p):
    g, p = _f32(g, p)
    return g[..., 7:8] * quat_rotate(g[..., 3:7], p) + g[..., :3]


def sim3_act4(g, p4):
    """Apply Sim3 to homogeneous points: [s R p + W t, W]."""
    g, p4 = _f32(g, p4)
    xyz = g[..., 7:8] * quat_rotate(g[..., 3:7], p4[..., :3]) \
        + p4[..., 3:4] * g[..., :3]
    return jnp.concatenate([xyz, p4[..., 3:4]], axis=-1)


def sim3_matrix(g):
    g = _f32(g)
    R = quat_to_matrix(g[..., 3:7]) * g[..., 7:8, None]
    m = jnp.zeros(g.shape[:-1] + (4, 4), dtype=g.dtype)
    m = m.at[..., :3, :3].set(R)
    m = m.at[..., :3, 3].set(g[..., :3])
    return m.at[..., 3, 3].set(1.0)


def sim3_adj_matrix(g):
    """Sim3 adjoint (..., 7, 7), tangent order [tau, phi, sigma]."""
    g = _f32(g)
    R = quat_to_matrix(g[..., 3:7])
    s = g[..., 7:8, None]
    t = g[..., :3]
    sR = s * R
    txR = _mm(skew(t), R)
    batch = g.shape[:-1]
    A = jnp.zeros(batch + (7, 7), dtype=g.dtype)
    A = A.at[..., :3, :3].set(sR)
    A = A.at[..., :3, 3:6].set(txR)
    A = A.at[..., :3, 6].set(-t)
    A = A.at[..., 3:6, 3:6].set(R)
    return A.at[..., 6, 6].set(1.0)


def sim3_adjT(g, a):
    """Transpose-adjoint on cotangent vectors a (..., 7)."""
    g, a = _f32(g, a)
    return _mtv(sim3_adj_matrix(g), a)


def sim3_retr(g, xi):
    return sim3_mul(sim3_exp(xi), g)


def se3_to_sim3(g):
    g = _f32(g)
    return jnp.concatenate([g, jnp.ones_like(g[..., :1])], axis=-1)


def sim3_to_se3(g):
    """Drop scale (renormalizing translation is caller's business)."""
    return _f32(g)[..., :7]


# ---------------------------------------------------------------------------
# Generic dispatch (group name -> ops), mirroring lietorch's group registry
# ---------------------------------------------------------------------------

GROUPS = {
    "SO3": dict(dim=4, dof=3, exp=so3_exp, log=so3_log, inv=so3_inv,
                mul=so3_mul, act=so3_act),
    "RxSO3": dict(dim=5, dof=4, exp=rxso3_exp, log=rxso3_log, inv=rxso3_inv,
                  mul=rxso3_mul, act=rxso3_act),
    "SE3": dict(dim=7, dof=6, exp=se3_exp, log=se3_log, inv=se3_inv,
                mul=se3_mul, act=se3_act),
    "Sim3": dict(dim=8, dof=7, exp=sim3_exp, log=sim3_log, inv=sim3_inv,
                 mul=sim3_mul, act=sim3_act),
}
