"""Micro-benchmark harness that survives this environment's traps.

Through the axon remote-TPU tunnel: (a) a blocking fetch costs ~30 ms
regardless of compute, (b) re-executions with identical inputs can be
served memoized, (c) `x * 0` data dependencies are constant-folded and
the whole loop body DCE'd.  So: run `reps` iterations INSIDE one jitted
fori_loop, thread a live integer accumulator through inputs and outputs
with fold-proof ops (`acc // INT32_MAX` is 0 at runtime but opaque to
the compiler), vary the seed per call, and subtract a 1-rep run to
cancel the fixed sync cost.

Usage:
    from microbench import timed
    timed("name", fn, *args)   # fn: jax fn of *args -> pytree
"""
import time
from functools import partial

import jax
import jax.numpy as jnp

BIG = jnp.int32(2147483647)


def timed(name, fn, *args, reps=16, int_arg=0):
    """Print steady-state ms/call of fn(*args).

    int_arg: index of an int32 array arg that receives the fold-proof
    perturbation (its values must stay valid after +0/+1 shifts... the
    shift is 0 at runtime).
    """

    @partial(jax.jit, static_argnames=("reps",))
    def chain(acc, reps, *a):
        def body(i, acc):
            z = acc // BIG                      # 0 at runtime, opaque
            a2 = list(a)
            a2[int_arg] = a2[int_arg] + z.astype(a2[int_arg].dtype)
            out = fn(*a2)
            leaf = jax.tree.leaves(out)[0]
            v = leaf.reshape(-1)[0]
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                v = jnp.clip(v, -1e6, 1e6).astype(jnp.int32)
            elif leaf.dtype == jnp.bool_:
                v = v.astype(jnp.int32)
            else:
                v = v.astype(jnp.int32)
            return (acc + v) % BIG
        return jax.lax.fori_loop(0, reps, body, acc)

    # warm (compile) BOTH programs before timing anything
    int(chain(jnp.int32(1), 1, *args))
    int(chain(jnp.int32(2), reps, *args))
    ts = []
    for variant, r in ((3, 1), (4, reps), (5, 1), (6, reps)):
        t0 = time.perf_counter()
        int(chain(jnp.int32(variant * 7 + 1), r, *args))
        ts.append(time.perf_counter() - t0)
    t1 = min(ts[0], ts[2])
    tn = min(ts[1], ts[3])
    per = (tn - t1) / (reps - 1) * 1e3
    print(f"{name:42s} {per:8.2f} ms/call   (1rep {t1*1e3:6.1f} ms, "
          f"{reps}rep {tn*1e3:7.1f} ms)", flush=True)
    return per
