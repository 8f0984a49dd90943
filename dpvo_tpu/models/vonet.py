"""VONet = Patchifier + Update (flax.linen).

Rebuild of the reference's dpvo/net.py:91-269.  The Patchifier runs the
two CNN encoders and extracts patch features at sampled centroids; VONet
bundles it with the recurrent Update operator.  The training rollout
(ref VONet.forward, net.py:184-268) lives in ``dpvo_tpu.train`` as a
scan-friendly function rather than a stateful module method.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import corr as corr_ops
from .encoder import BasicEncoder4
from .update import Update, DIM


def normalize_images(images_u8):
    """uint8 (..., H, W, 3) -> normalized float (ref net.py:187 /
    dpvo.py:389): 2 * (x / 255) - 0.5, channel order preserved (BGR)."""
    return 2.0 * (images_u8.astype(jnp.float32) / 255.0) - 0.5


def image_gradient(images):
    """Scharr-free intensity gradient for GRADIENT_BIAS patch selection
    (ref net.py:98-104).  images (N, H, W, 3) normalized -> (N, H/4, W/4)."""
    gray = ((images + 0.5) * (255.0 / 2)).sum(axis=-1)
    dx = gray[..., :-1, 1:] - gray[..., :-1, :-1]
    dy = gray[..., 1:, :-1] - gray[..., :-1, :-1]
    g = jnp.sqrt(dx ** 2 + dy ** 2)
    g = jnp.pad(g, ((0, 0), (0, 1), (0, 1)))
    N, H, W = g.shape
    return g.reshape(N, H // 4, 4, W // 4, 4).mean(axis=(2, 4))


class Patchifier(nn.Module):
    """Feature extraction + patch sampling (ref net.py:91-153)."""
    patch_size: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.fnet = BasicEncoder4(output_dim=128, norm_fn="instance",
                                  dtype=self.dtype)
        self.inet = BasicEncoder4(output_dim=DIM, norm_fn="none",
                                  dtype=self.dtype)

    def encode(self, images):
        """images (N, H, W, 3) normalized -> fmap (N, h, w, 128),
        imap (N, h, w, DIM), both /4 res and scaled by 1/4
        (ref net.py:108-109)."""
        fmap = self.fnet(images) / 4.0
        imap = self.inet(images) / 4.0
        return fmap, imap

    def __call__(self, images, coords, disps=None):
        """Extract patches at given centroids.

        images (N, H, W, 3) normalized; coords (N, M, 2) float feature-res
        centroids; disps (N, h, w) optional inverse depth (training).
        Returns (fmap, gmap, imap_p, patches, index, clr):
          fmap    (N, h, w, 128)
          gmap    (N, M, P, P, 128)
          imap_p  (N, M, DIM)
          patches (N, M, 3, P, P)  geometry layout [x, y, d]
          index   (N*M,) frame index per patch
          clr     (N, M, 3) color samples (for visualization)
        """
        N, H, W, _ = images.shape
        P = self.patch_size
        M = coords.shape[1]

        fmap, imap = self.encode(images)
        h, w = fmap.shape[1:3]

        imap_p = corr_ops.patchify(imap, coords, 0)[:, :, 0, 0, :]
        gmap = corr_ops.patchify(fmap, coords, P // 2)

        clr = corr_ops.patchify(images, 4 * (coords + 0.5), 0)[:, :, 0, 0, :]

        if disps is None:
            disps = jnp.ones((N, h, w), dtype=jnp.float32)

        # grid channels-last: (N, h, w, 3) = [x, y, disp]
        y, x = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                            jnp.arange(w, dtype=jnp.float32), indexing="ij")
        grid = jnp.stack([jnp.broadcast_to(x, disps.shape),
                          jnp.broadcast_to(y, disps.shape),
                          disps.astype(jnp.float32)], axis=-1)
        patches = corr_ops.patchify(grid, coords, P // 2)  # (N, M, P, P, 3)
        patches = patches.transpose(0, 1, 4, 2, 3)         # (N, M, 3, P, P)

        index = jnp.repeat(jnp.arange(N), M)
        return fmap, gmap, imap_p, patches, index, clr


def select_centroids(key, strat, n, h, w, M, gradient=None):
    """Patch centroid sampling (ref net.py:115-132), host/device side.

    Returns (n, M, 2) float [x, y] at feature resolution.
    """
    kx, ky = jax.random.split(key)
    if strat == "RANDOM":
        x = jax.random.randint(kx, (n, M), 1, w - 1)
        y = jax.random.randint(ky, (n, M), 1, h - 1)
    elif strat == "GRADIENT_BIAS":
        assert gradient is not None
        x = jax.random.randint(kx, (n, 3 * M), 1, w - 1)
        y = jax.random.randint(ky, (n, 3 * M), 1, h - 1)
        coords = jnp.stack([x, y], axis=-1).astype(jnp.float32)
        g = corr_ops.patchify(gradient[..., None], coords, 0)[:, :, 0, 0, 0]
        ix = jnp.argsort(g, axis=1)[:, -M:]
        x = jnp.take_along_axis(x, ix, axis=1)
        y = jnp.take_along_axis(y, ix, axis=1)
    else:
        raise NotImplementedError(
            f"Patch centroid selection not implemented: {strat}")
    return jnp.stack([x, y], axis=-1).astype(jnp.float32)


class VONet(nn.Module):
    """Patchifier + Update bundle (ref net.py:172-181)."""
    patch_size: int = 3
    dtype: jnp.dtype = jnp.float32

    P: int = 3
    RES: int = 4

    def setup(self):
        self.patchify = Patchifier(self.patch_size, self.dtype)
        self.update = Update(self.patch_size, self.dtype)

    def __call__(self, images, coords, net, inp, corr, ii, jj, kk,
                 valid=None):
        """Wire both submodules once so flax initializes all params."""
        out = self.patchify(images, coords)
        upd = self.update(net, inp, corr, ii, jj, kk, valid)
        return out, upd
