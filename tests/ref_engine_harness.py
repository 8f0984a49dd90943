"""Harness that runs the REFERENCE DPVO engine (torch) on CPU.

Extends tests/test_parity.py's stub infrastructure so the full SLAM
engine (/root/reference/methods/dpvo/dpvo/dpvo.py) can execute without
CUDA:

- a ``TorchFunctionMode`` rewrites every ``device="cuda"`` factory kwarg
  to cpu and makes ``Tensor.cuda()`` the identity (the engine hard-codes
  the cuda device ~20x, dpvo.py:17,117,242,322,338 etc.);
- ``altcorr.corr`` gets an exact dense CPU implementation of the CUDA
  kernel (correlation_kernel.cu:83-137 integer tap grid, f32 accumulate,
  4-tap bilinear blend + permute of corr_cuda_forward :194-234);
- ``fastba.BA`` is backed by ``dpvo_tpu.ops.ba.ba_iterative`` (the CUDA
  BA twin, itself parity-tested in tests/test_ba.py), writing results
  back into the torch views in place like the CUDA extension;
- ``lietorch.SE3`` is completed with Identity/exp/log/scale/stack and
  item assignment on top of test_parity.FakeSE3 (backed by the
  axiom-tested dpvo_tpu.ops.lie).

The harness exists for tests/test_engine_parity.py: the only obtainable
end-to-end accuracy evidence in this image (no datasets/weights), per
the round-1 verdict.
"""
from __future__ import annotations

import sys
import types

import numpy as np

import test_parity as tp  # noqa: F401  (re-uses its stubs)

torch = tp.torch
REF = tp.REF

from torch.overrides import TorchFunctionMode  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


class CudaToCpu(TorchFunctionMode):
    """Rewrite device='cuda' kwargs to cpu; Tensor.cuda() -> identity."""

    def __torch_function__(self, func, types_, args=(), kwargs=None):
        kwargs = dict(kwargs or {})
        if func is torch.Tensor.cuda:
            return args[0]
        d = kwargs.get("device")
        if d is not None and "cuda" in str(d):
            kwargs["device"] = "cpu"
        return func(*args, **kwargs)


# ---------------------------------------------------------------------------
# dense CPU altcorr.corr (exact CUDA twin)
# ---------------------------------------------------------------------------

def corr_stub(fmap1, fmap2, coords, ii, jj, radius=3, dropout=1,
              chunk=128):
    """corr_cuda_forward twin: fmap1 (1, K, C, P, P) patch features,
    fmap2 (1, F, C, H2, W2) frame features, coords (1, E, 2, P, P),
    ii/jj (E,) long.  Returns (1, E, D-1, D-1, P, P) with the
    [x_off, y_off] ordering of the final permute (cu:233).

    Edges are processed GROUPED BY TARGET FRAME so each chunk gathers
    from one frame VIEW — the earlier per-edge ``index_select`` copied
    a full (C, H2, W2) frame per edge (1.26 GB per 128-edge chunk at
    the 480p operating point), which OOM-killed the full-scale parity
    run (frame 7, ~45k-edge updates)."""
    coords = coords.float()
    _, E, _, P, _ = coords.shape
    C = fmap1.shape[2]
    D = 2 * radius + 2
    H2, W2 = fmap2.shape[-2:]
    di = torch.arange(D) - radius
    out_all = torch.empty(E, D - 1, D - 1, P, P)
    order = torch.argsort(jj, stable=True)
    bounds = torch.searchsorted(
        jj[order], torch.arange(int(fmap2.shape[1]) + 1))
    for fidx in range(int(fmap2.shape[1])):
        lo, hi = int(bounds[fidx]), int(bounds[fidx + 1])
        if lo == hi:
            continue
        f_flat = fmap2[0, fidx].float().reshape(C, H2 * W2)  # view-ish
        for s in range(lo, hi, chunk):
            e = min(s + chunk, hi)
            sel = order[s:e]
            m = e - s
            c = coords[0, sel]                           # (m, 2, P, P)
            g = fmap1[0, ii[sel]].float()                # (m, C, P, P)
            x0 = c[:, 0].floor().long()                  # (m, P, P)
            y0 = c[:, 1].floor().long()
            i1 = y0[..., None, None] + di.view(1, 1, 1, D, 1)
            j1 = x0[..., None, None] + di.view(1, 1, 1, 1, D)
            i1, j1 = torch.broadcast_tensors(i1, j1)     # (m, P, P, D, D)
            inb = ((i1 >= 0) & (i1 < H2) & (j1 >= 0) & (j1 < W2))
            lin = (i1.clamp(0, H2 - 1) * W2
                   + j1.clamp(0, W2 - 1)).reshape(-1)
            fg = f_flat[:, lin].view(C, m, P, P, D, D)
            fg = fg * inb[None].float()
            # corr[m][iy][jx][p_y][p_x]: dot over C (f32 accumulate)
            sc = (g.permute(1, 0, 2, 3)[..., None, None] * fg).sum(0)
            corr = sc.permute(0, 3, 4, 1, 2)             # (m, iy, jx, P, P)
            dx = (c[:, 0] - c[:, 0].floor())[:, None, None]
            dy = (c[:, 1] - c[:, 1].floor())[:, None, None]
            out = ((1 - dx) * (1 - dy) * corr[:, :D - 1, :D - 1]
                   + dx * (1 - dy) * corr[:, :D - 1, 1:]
                   + (1 - dx) * dy * corr[:, 1:, :D - 1]
                   + dx * dy * corr[:, 1:, 1:])
            out_all[sel] = out.permute(0, 2, 1, 3, 4)    # (m, jx, iy, P, P)
    return out_all[None]


# ---------------------------------------------------------------------------
# fastba.BA stub backed by ops.ba.ba_iterative
# ---------------------------------------------------------------------------

def ba_stub(poses, patches, intrinsics, target, weight, lmbda,
            ii, jj, kk, t0, t1, M=96, iterations=2, eff_impl=False):
    """In-place GN BA like the cuda_ba extension (ba_cuda.cu:433-582).

    poses (1, N, 7) / patches (1, K, 3, P, P) are torch VIEWS of the
    engine state; results are copied back in place.
    """
    from dpvo_tpu.ops import ba as ba_ops

    E = len(ii)
    Ep = max(-(-E // 1024) * 1024, 1024)
    pad = Ep - E

    def p32(x):
        return np.concatenate(
            [np.asarray(x, np.float32),
             np.zeros((pad,) + x.shape[1:], np.float32)])

    def pi32(x):
        return np.concatenate([np.asarray(x, np.int32),
                               np.zeros(pad, np.int32)])

    valid = np.arange(Ep) < E
    new_poses, new_patches = ba_ops.ba_iterative(
        jnp.asarray(poses[0].detach().numpy()),
        jnp.asarray(patches[0].detach().numpy()),
        jnp.asarray(intrinsics[0, 0].detach().numpy()),
        jnp.asarray(p32(target[0].detach().numpy())),
        jnp.asarray(p32(weight[0].detach().numpy())),
        jnp.float32(float(lmbda)),
        jnp.asarray(pi32(ii.numpy())), jnp.asarray(pi32(jj.numpy())),
        jnp.asarray(pi32(kk.numpy())), jnp.asarray(valid),
        jnp.int32(int(t0)), jnp.int32(int(t1)),
        # k_cap must cover the distinct patches touched by the active
        # window: at the 480p default point that's ~(REMOVAL_WINDOW+4)*96
        # ~ 2.5k — 2048 silently dropped the overflow (compactify's
        # mode="drop") and skewed full-scale parity
        n_cap=32, k_cap=4096, iterations=iterations)
    poses[0].copy_(torch.from_numpy(np.asarray(new_poses)))
    patches[0].copy_(torch.from_numpy(np.asarray(new_patches)))


# ---------------------------------------------------------------------------
# FakeSE3 completion (adds the surface the engine itself needs)
# ---------------------------------------------------------------------------

_jit_cache = {}


def _lie_batch_padded(fn, *arrays):
    """Drop-in for test_parity._lie_batch that pads the flattened batch
    to a power of two and jits per (fn, padded shape): the engine calls
    Lie ops at a different edge count every update, and an unpadded
    vmap would retrace/compile each time (measured: the reference-engine
    run spent most of its wall clock in these retraces)."""
    lead = arrays[0].shape[:-1]
    n = 1
    for s in lead:
        n *= int(s)
    npad = max(256, 1 << max(n - 1, 1).bit_length())
    flats = []
    for a in arrays:
        f = np.ascontiguousarray(
            a.detach().numpy().reshape(-1, a.shape[-1]))
        pad = np.zeros((npad - n, a.shape[-1]), f.dtype)
        flats.append(jnp.asarray(np.concatenate([f, pad])))
    key = (fn, npad, tuple(f.shape for f in flats))
    if key not in _jit_cache:
        _jit_cache[key] = jax.jit(jax.vmap(fn))
    out = np.asarray(_jit_cache[key](*flats))[:n]
    return torch.from_numpy(out.reshape(*lead, out.shape[-1]).copy())


def _complete_fake_se3():
    from dpvo_tpu.ops import lie
    F = tp.FakeSE3

    if getattr(F, "_engine_complete", False):
        return F

    # speed: shared padded/jitted lie bridge (see _lie_batch_padded)
    tp._lie_batch = _lie_batch_padded

    def log(self):
        return tp._lie_batch(lie.se3_log, self.data)

    def scale(self, s):
        d = self.data.clone()
        d[..., :3] *= float(s)
        return F(d)

    def __setitem__(self, idx, val):
        self.data[idx] = val

    @classmethod
    def Identity(cls, n, device=None, **kw):
        d = torch.zeros(n, 7)
        d[..., 6] = 1.0
        return cls(d)

    @classmethod
    def exp(cls, xi):
        return cls(tp._lie_batch(lie.se3_exp, xi.float()))

    F.log = log
    F.scale = scale
    F.__setitem__ = __setitem__
    F.Identity = Identity
    F.exp = exp
    F.device = property(lambda self: self.data.device)
    F._engine_complete = True
    return F


def _lietorch_stack(groups, dim=0):
    F = tp.FakeSE3
    return F(torch.stack([g.data for g in groups], dim=dim))


# ---------------------------------------------------------------------------
# module installation + engine import
# ---------------------------------------------------------------------------

def install_engine_stubs():
    """Install/refresh the dpvo.* stub modules for a full-engine run and
    import dpvo.dpvo.  Returns the imported dpvo.dpvo module."""
    if REF not in sys.path:
        # APPEND: the reference tree ships same-named top-level modules
        # (evaluate_euroc.py, demo.py, ...); prepending would shadow the
        # repo's own for every test that runs after a parity test
        sys.path.append(REF)

    F = _complete_fake_se3()

    from dpvo_tpu.ops.graph import neighbors_host

    def _neighbors(kk, jj):
        ix, jx = neighbors_host(kk.numpy(), jj.numpy(), len(kk))
        return torch.from_numpy(ix).long(), torch.from_numpy(jx).long()

    fastba = sys.modules.setdefault("dpvo.fastba",
                                    types.ModuleType("dpvo.fastba"))
    fastba.neighbors = _neighbors
    fastba.BA = ba_stub
    fastba.reproject = None

    altcorr = sys.modules.setdefault("dpvo.altcorr",
                                     types.ModuleType("dpvo.altcorr"))
    altcorr.patchify = tp._patchify_stub
    altcorr.corr = corr_stub

    lt = sys.modules.setdefault("dpvo.lietorch",
                                types.ModuleType("dpvo.lietorch"))
    lt.SE3 = F
    lt.Sim3 = getattr(lt, "Sim3", type("Sim3", (), {}))
    lt.LieGroupParameter = None
    lt.stack = _lietorch_stack

    # patchgraph imports reduce_edges from loop_closure.optim_utils,
    # whose real module needs numba/pypose; only used with LOOP_CLOSURE
    lc_pkg = types.ModuleType("dpvo.loop_closure")
    ou = types.ModuleType("dpvo.loop_closure.optim_utils")
    ou.reduce_edges = None
    lc_pkg.optim_utils = ou
    sys.modules.setdefault("dpvo.loop_closure", lc_pkg)
    sys.modules.setdefault("dpvo.loop_closure.optim_utils", ou)

    with CudaToCpu():
        import dpvo.dpvo as ref_engine
    return ref_engine
