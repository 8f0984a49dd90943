"""Numerical forward-parity vs the reference torch modules (CPU).

Imports the reference network code from /root/reference/methods/dpvo with
its CUDA extensions stubbed out (fastba.neighbors reimplemented from our
host twin, altcorr.patchify as an exact dense gather+blend, lietorch SE3
backed by our axiom-tested ops.lie), initializes random torch weights,
converts them through utils.checkpoint.convert_state_dict, and asserts
the JAX modules reproduce the torch outputs within fp32 tolerance.

This is the acceptance evidence for weight imports: a wrong LayerNorm
epsilon, conv padding, or name-map transpose fails these tests
(reference: net.py:23-153, extractor.py:200-264, blocks.py:31-48,
ba.py:86-182).
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = "/root/reference/methods/dpvo"
DIM = 384


@pytest.fixture(autouse=True, scope="module")
def _highest_precision():
    """fp32 parity needs exact f32 matmuls; the TPU backend's default
    matmul precision rounds f32 inputs to bf16 on the MXU."""
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)


# ---------------------------------------------------------------------------
# stubs for the reference's CUDA extensions
# ---------------------------------------------------------------------------

def _patchify_stub(net, coords, radius):
    """Exact CPU stand-in for altcorr.patchify (correlation.py:55-74 +
    patchify_forward_kernel): gather (2r+2)^2 windows at floor(coords)
    with zero OOB, then the 4-tap bilinear blend."""
    coords = coords.float()
    N, C, H, W = net.shape
    M = coords.shape[1]
    r = radius
    D = 2 * r + 2
    fl = coords.floor().long()
    win = torch.zeros(N, M, C, D, D, dtype=net.dtype)
    for n in range(N):
        for m in range(M):
            x0 = int(fl[n, m, 0])
            y0 = int(fl[n, m, 1])
            for dy in range(D):
                yy = y0 + dy - r
                if not (0 <= yy < H):
                    continue
                for dx in range(D):
                    xx = x0 + dx - r
                    if 0 <= xx < W:
                        win[n, m, :, dy, dx] = net[n, :, yy, xx]
    off = coords - coords.floor()
    dx = off[:, :, None, None, None, 0]
    dy = off[:, :, None, None, None, 1]
    d = 2 * r + 1
    return ((1 - dy) * (1 - dx) * win[..., :d, :d]
            + (1 - dy) * dx * win[..., :d, 1:]
            + dy * (1 - dx) * win[..., 1:, :d]
            + dy * dx * win[..., 1:, 1:])


def _lie_batch(fn, *arrays):
    """Apply a dpvo_tpu.ops.lie function over flattened leading dims of
    torch tensors; returns a torch tensor."""
    shapes = [a.shape for a in arrays]
    lead = shapes[0][:-1]
    flat = [jnp.asarray(np.ascontiguousarray(
        a.detach().numpy().reshape(-1, a.shape[-1]))) for a in arrays]
    out = jax.vmap(fn)(*flat)
    out = np.asarray(out)
    return torch.from_numpy(out.reshape(*lead, out.shape[-1]))


class FakeSE3:
    """Minimal torch-facing SE3 backed by dpvo_tpu.ops.lie, covering the
    surface projective_ops.transform and ba.BA use (groups.py:266-287)."""

    def __init__(self, data):
        self.data = data.float()

    @property
    def shape(self):
        return self.data.shape[:-1]

    def __getitem__(self, idx):
        return FakeSE3(self.data[idx])

    def inv(self):
        from dpvo_tpu.ops import lie
        return FakeSE3(_lie_batch(lie.se3_inv, self.data))

    def __mul__(self, other):
        from dpvo_tpu.ops import lie
        if isinstance(other, FakeSE3):
            a, b = torch.broadcast_tensors(self.data, other.data)
            return FakeSE3(_lie_batch(lie.se3_mul, a, b))
        # group action on homogeneous 4-vectors (act4)
        g = self.data
        while g.dim() < other.dim():
            g = g.unsqueeze(-2)
        g, p = torch.broadcast_tensors(
            g, other[..., :1].expand(*other.shape[:-1], 7))
        g = g.reshape(-1, 7)
        out = _lie_batch(lie.se3_act4, g.reshape(*other.shape[:-1], 7),
                         other)
        return out

    def adjT(self, J):
        from dpvo_tpu.ops import lie
        g = self.data
        while g.dim() < J.dim():
            g = g.unsqueeze(-2)
        g = g.expand(*J.shape[:-1], 7)
        return _lie_batch(lie.se3_adjT, g, J)

    def matrix(self):
        from dpvo_tpu.ops import lie
        d = self.data
        flat = jnp.asarray(d.detach().numpy().reshape(-1, 7))
        out = np.asarray(jax.vmap(lie.se3_matrix)(flat))
        return torch.from_numpy(out.reshape(*d.shape[:-1], 4, 4))

    def retr(self, dx):
        from dpvo_tpu.ops import lie
        g, x = self.data, dx.float()
        return FakeSE3(_lie_batch(lambda gg, xx: lie.se3_retr(gg, xx),
                                  g, x))


@pytest.fixture(scope="module")
def ref_modules():
    """Import reference dpvo.{extractor,blocks,net,ba,projective_ops}
    with stubbed native extensions."""
    if REF not in sys.path:
        sys.path.insert(0, REF)

    from dpvo_tpu.ops.graph import neighbors_host

    fastba = types.ModuleType("dpvo.fastba")

    def _neighbors(kk, jj):
        ix, jx = neighbors_host(kk.numpy(), jj.numpy(), len(kk))
        return torch.from_numpy(ix).long(), torch.from_numpy(jx).long()

    fastba.neighbors = _neighbors
    fastba.BA = None
    fastba.reproject = None

    altcorr = types.ModuleType("dpvo.altcorr")
    altcorr.patchify = _patchify_stub
    altcorr.corr = None

    lietorch = types.ModuleType("dpvo.lietorch")
    lietorch.SE3 = FakeSE3
    lietorch.Sim3 = type("Sim3", (), {})
    lietorch.LieGroupParameter = None

    sys.modules.setdefault("dpvo.fastba", fastba)
    sys.modules.setdefault("dpvo.altcorr", altcorr)
    sys.modules.setdefault("dpvo.lietorch", lietorch)

    import dpvo.extractor as ref_extractor
    import dpvo.blocks as ref_blocks
    import dpvo.net as ref_net
    import dpvo.ba as ref_ba
    import dpvo.projective_ops as ref_pops
    return types.SimpleNamespace(
        extractor=ref_extractor, blocks=ref_blocks, net=ref_net,
        ba=ref_ba, pops=ref_pops)


def _to_jax_img(x_torch):
    """(B, N, 3, H, W) torch -> (N, H, W, 3) jax (B=1)."""
    return jnp.asarray(x_torch[0].permute(0, 2, 3, 1).numpy())


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("norm_fn", ["instance", "none"])
def test_encoder_parity(ref_modules, norm_fn):
    from dpvo_tpu.models.encoder import BasicEncoder4
    from dpvo_tpu.utils.checkpoint import convert_state_dict

    torch.manual_seed(3)
    out_dim = 128 if norm_fn == "instance" else DIM
    ref = ref_modules.extractor.BasicEncoder4(
        output_dim=out_dim, norm_fn=norm_fn).eval()

    x = torch.randn(1, 2, 3, 32, 48)
    with torch.no_grad():
        y_ref = ref(x)[0].permute(0, 2, 3, 1).numpy()   # (N, h, w, C)

    # route weights through the .pth name map
    sd = {f"patchify.fnet.{k}": v for k, v in ref.state_dict().items()}
    sd.update({f"patchify.inet.{k}": v for k, v in ref.state_dict().items()})
    # fill the other encoder's slots so the converter finds both trees
    params, _ = convert_state_dict(
        {**sd, **{f"update.{k}": torch.zeros(1)
                  for k in ()}})  # update tree unused here
    tree = params["params"]["fnet" if norm_fn == "instance" else "inet"]

    enc = BasicEncoder4(output_dim=out_dim, norm_fn=norm_fn,
                        dtype=jnp.float32)
    y = enc.apply({"params": tree}, _to_jax_img(x))
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# patchifier (encoders + patch/grid extraction at given centroids)
# ---------------------------------------------------------------------------

def test_patchifier_parity(ref_modules):
    from dpvo_tpu.models.vonet import Patchifier
    from dpvo_tpu.utils.checkpoint import convert_state_dict

    torch.manual_seed(4)
    ref_p = ref_modules.net.Patchifier(patch_size=3).eval()

    N, H, W, M = 2, 32, 48, 4
    h, w = H // 4, W // 4
    img_u8 = torch.randint(0, 255, (1, N, 3, H, W)).float()
    images = 2 * (img_u8 / 255.0) - 0.5

    # fixed integer centroids (the reference samples them on-device;
    # both sides receive the same ones)
    gx = torch.randint(1, w - 1, (N, M))
    gy = torch.randint(1, h - 1, (N, M))
    coords_t = torch.stack([gx, gy], dim=-1).float()

    with torch.no_grad():
        fmap_r = ref_p.fnet(images) / 4.0
        imap_r = ref_p.inet(images) / 4.0
        gmap_r = _patchify_stub(fmap_r[0], coords_t, 1)      # (N,M,128,3,3)
        ctx_r = _patchify_stub(imap_r[0], coords_t, 0)       # (N,M,DIM,1,1)
        from dpvo.utils import coords_grid_with_index
        disps = torch.ones(1, N, h, w)
        grid, _ = coords_grid_with_index(disps)
        patches_r = _patchify_stub(grid[0], coords_t, 1)     # (N,M,3,3,3)

    sd = ref_p.state_dict()
    raw = {f"patchify.{k}": v for k, v in sd.items()}
    params, _ = convert_state_dict(raw)

    jx = Patchifier(patch_size=3, dtype=jnp.float32)
    fmap, gmap, imap_p, patches, index, clr = jx.apply(
        params, jnp.asarray(images[0].permute(0, 2, 3, 1).numpy()),
        jnp.asarray(coords_t.numpy()))

    np.testing.assert_allclose(
        np.asarray(fmap), fmap_r[0].permute(0, 2, 3, 1).numpy(),
        atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gmap), gmap_r.permute(0, 1, 3, 4, 2).numpy(),
        atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(imap_p), ctx_r[..., 0, 0].numpy(), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(patches), patches_r.numpy(), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(index),
                                  np.repeat(np.arange(N), M))


# ---------------------------------------------------------------------------
# recurrent update operator
# ---------------------------------------------------------------------------

def test_update_parity(ref_modules):
    from dpvo_tpu.models.update import Update
    from dpvo_tpu.utils.checkpoint import convert_state_dict

    torch.manual_seed(5)
    ref_u = ref_modules.net.Update(p=3).eval()

    E = 48
    rng = np.random.default_rng(0)
    net0 = rng.normal(size=(E, DIM)).astype(np.float32)
    ctx = rng.normal(size=(E, DIM)).astype(np.float32)
    corr = rng.normal(size=(E, 2 * 49 * 9)).astype(np.float32)
    ii = rng.integers(0, 6, E).astype(np.int64)
    jj = rng.integers(0, 6, E).astype(np.int64)
    kk = rng.integers(0, 24, E).astype(np.int64)

    with torch.no_grad():
        net_r, (d_r, w_r, _) = ref_u(
            torch.from_numpy(net0)[None], torch.from_numpy(ctx)[None],
            torch.from_numpy(corr)[None], None,
            torch.from_numpy(ii), torch.from_numpy(jj),
            torch.from_numpy(kk))

    raw = {f"update.{k}": v for k, v in ref_u.state_dict().items()}
    _, u_params = convert_state_dict(raw)

    upd = Update(p=3, dtype=jnp.float32)
    net_j, d_j, w_j = upd.apply(
        u_params, jnp.asarray(net0), jnp.asarray(ctx), jnp.asarray(corr),
        jnp.asarray(ii, jnp.int32), jnp.asarray(jj, jnp.int32),
        jnp.asarray(kk, jnp.int32))

    np.testing.assert_allclose(np.asarray(net_j), net_r[0].numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d_j), d_r[0].numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(w_j), w_r[0].numpy(),
                               atol=5e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# differentiable training BA
# ---------------------------------------------------------------------------

def test_ba_parity(ref_modules):
    from dpvo_tpu.ops.ba import ba_differentiable
    from dpvo_tpu.ops import lie

    rng = np.random.default_rng(7)
    N, M, P = 6, 4, 3
    K = N * M
    W, H = 64, 48

    # small random motions around identity
    xi = 0.03 * rng.normal(size=(N, 6)).astype(np.float32)
    poses = np.asarray(jax.vmap(lie.se3_exp)(jnp.asarray(xi)))
    intr = np.tile(np.asarray([40.0, 40.0, 32.0, 24.0], np.float32),
                   (N, 1))

    patches = np.zeros((K, 3, P, P), np.float32)
    cx = rng.uniform(8, W - 8, K)
    cy = rng.uniform(8, H - 8, K)
    d = rng.uniform(0.5, 2.0, K)
    gy, gx = np.mgrid[-1:2, -1:2]
    patches[:, 0] = cx[:, None, None] + gx
    patches[:, 1] = cy[:, None, None] + gy
    patches[:, 2] = d[:, None, None]

    E = 40
    ii = rng.integers(0, N, E).astype(np.int64)
    jj = rng.integers(0, N, E).astype(np.int64)
    kk = (ii * M + rng.integers(0, M, E)).astype(np.int64)
    targets = np.stack([rng.uniform(8, W - 8, E),
                        rng.uniform(8, H - 8, E)], -1).astype(np.float32)
    weights = rng.uniform(0.3, 1.0, (E, 2)).astype(np.float32)
    bounds = [0.0, 0.0, float(W), float(H)]

    ref_poses = FakeSE3(torch.from_numpy(poses)[None].clone())
    ref_out_poses, ref_out_patches = ref_modules.ba.BA(
        ref_poses, torch.from_numpy(patches)[None].clone(),
        torch.from_numpy(intr)[None], torch.from_numpy(targets)[None],
        torch.from_numpy(weights)[None], 1e-4,
        torch.from_numpy(ii), torch.from_numpy(jj), torch.from_numpy(kk),
        bounds, ep=100.0, fixedp=1, structure_only=False)

    out_poses, out_patches = ba_differentiable(
        jnp.asarray(poses), jnp.asarray(patches), jnp.asarray(intr),
        jnp.asarray(targets), jnp.asarray(weights), jnp.float32(1e-4),
        jnp.asarray(ii, jnp.int32), jnp.asarray(jj, jnp.int32),
        jnp.asarray(kk, jnp.int32), jnp.ones(E, bool), bounds,
        ep=100.0, fixedp=1, structure_only=False)

    np.testing.assert_allclose(np.asarray(out_poses),
                               ref_out_poses.data[0].numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_patches),
                               ref_out_patches[0].numpy(),
                               atol=1e-4, rtol=1e-3)
