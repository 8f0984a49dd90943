"""Double-precision gradient checks for the Lie-group ops.

Standalone script (run by tests/test_lie_x64.py in a subprocess with
JAX_PLATFORMS=cpu and a clean PYTHONPATH): mirrors the reference's
float64 gradchecks (ref dpvo/lietorch/run_tests.py:253-301 — exp/log,
inv, adj, adjT, act grads for SO3/RxSO3/SE3/Sim3, Sim3 at a looser
1e-3 tolerance) using exact jacfwd jacobians vs central finite
differences.  A subprocess is required because x64 must be enabled
before JAX initializes and the main suite runs with x64 disabled
(tests/conftest.py).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["JAX_ENABLE_X64"] = "1"

import numpy as np
import jax
import jax.numpy as jnp

from dpvo_tpu.ops import lie

assert jax.config.jax_enable_x64, "x64 must be on for this check"

# ref run_tests.py: eps=1e-4 central differences, atol 1e-8 in double
# (our numeric jacobian carries O(eps^2)=1e-8 truncation error itself,
# so the comparison tolerance is 2e-6 absolute — still ~100x tighter
# than any fp32 check); Sim3 gets the reference's looser 1e-3.
EPS = 1e-4
ATOL = 2e-6
ATOL_SIM3 = 1e-3

GROUPS = {
    "so3": dict(exp=lie.so3_exp, log=lie.so3_log, inv=lie.so3_inv,
                mul=lie.so3_mul, act=lie.so3_act, dim=3, atol=ATOL),
    "rxso3": dict(exp=lie.rxso3_exp, log=lie.rxso3_log, inv=lie.rxso3_inv,
                  mul=lie.rxso3_mul, act=lie.rxso3_act, dim=4, atol=ATOL),
    "se3": dict(exp=lie.se3_exp, log=lie.se3_log, inv=lie.se3_inv,
                mul=lie.se3_mul, act=lie.se3_act, dim=6, atol=ATOL,
                adj=lie.se3_adj, adjT=lie.se3_adjT),
    "sim3": dict(exp=lie.sim3_exp, log=lie.sim3_log, inv=lie.sim3_inv,
                 mul=lie.sim3_mul, act=lie.sim3_act, dim=7,
                 atol=ATOL_SIM3, adjT=lie.sim3_adjT),
}


def numeric_jac(f, x, eps=EPS):
    """Central-difference jacobian of f: (n,) -> (m,) in float64."""
    x = np.asarray(x, np.float64)
    y0 = np.asarray(f(jnp.asarray(x)))
    J = np.zeros(y0.shape + x.shape, np.float64)
    for i in range(x.size):
        d = np.zeros_like(x)
        d.flat[i] = eps
        yp = np.asarray(f(jnp.asarray(x + d)), np.float64)
        ym = np.asarray(f(jnp.asarray(x - d)), np.float64)
        J[..., i] = (yp - ym) / (2 * eps)
    return J


def check(name, f, x, atol):
    Ja = np.asarray(jax.jacfwd(f)(jnp.asarray(x, jnp.float64)))
    Jn = numeric_jac(f, x)
    err = np.abs(Ja - Jn).max()
    assert err < atol, f"{name}: max grad err {err:.3e} >= {atol:g}"
    print(f"  - {name}: ok (max err {err:.2e})", flush=True)


def main():
    rng = np.random.default_rng(0)
    for gname, G in GROUPS.items():
        d = G["dim"]
        atol = G["atol"]
        exp, log, inv, mul, act = (G["exp"], G["log"], G["inv"], G["mul"],
                                   G["act"])
        X = exp(jnp.asarray(0.5 * rng.normal(size=(d,)), jnp.float64))
        a0 = np.zeros(d)
        b0 = rng.normal(size=(d,))
        p = rng.normal(size=(3,))

        # exp/log grad at identity perturbation (ref test_exp_log_grad)
        check(f"{gname} exp-log", lambda a: log(mul(exp(a), X)), a0, atol)
        # inv grad (ref test_inv_log_grad)
        check(f"{gname} inv", lambda a: log(inv(mul(exp(a), X))), a0, atol)
        # action on points (ref test_act_grad), both wrt group and point
        check(f"{gname} act/a", lambda a: act(mul(exp(a), X), jnp.asarray(p)),
              a0, atol)
        check(f"{gname} act/p", lambda q: act(X, q), p, atol)
        # adjoint application (ref test_adj_grad / test_adjT_grad)
        if "adj" in G:
            check(f"{gname} adj",
                  lambda a: G["adj"](mul(exp(a), X), jnp.asarray(b0)),
                  a0, atol)
        if "adjT" in G:
            check(f"{gname} adjT",
                  lambda a: G["adjT"](mul(exp(a), X), jnp.asarray(b0)),
                  a0, atol)
        # grad wrt the adj/adjT argument is linear — check it too
        if "adjT" in G:
            check(f"{gname} adjT/b", lambda b: G["adjT"](X, b), b0, atol)
    print("X64 GRADCHECK OK", flush=True)


if __name__ == "__main__":
    main()
