"""CNN feature encoders (flax.linen, NHWC).

Rebuild of the reference's dpvo/extractor.py: ``ResidualBlock`` and the /4
resolution ``BasicEncoder4`` (conv7x7 s2 -> res layer (32, s1) -> res layer
(64, s2) -> 1x1 conv; ref extractor.py:200-264 with DIM=32 from
extractor.py:115).  fnet uses instance norm, inet no norm
(ref net.py:95-96).  Channels-last, bf16-friendly: convs run in
``dtype`` (bf16 on TPU) with fp32 params; normalization statistics are
computed in fp32.
"""
from __future__ import annotations


import jax.numpy as jnp
import flax.linen as nn

DIM = 32  # base width (ref extractor.py:115)


def instance_norm(x, eps=1e-5):
    """InstanceNorm2d(affine=False): per-sample, per-channel spatial norm.

    torch nn.InstanceNorm2d default has no learnable params
    (ref extractor.py:29-32 uses the default ctor).
    """
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=(-3, -2), keepdims=True)
    var = x32.var(axis=(-3, -2), keepdims=True)
    return ((x32 - mean) / jnp.sqrt(var + eps)).astype(x.dtype)


class _Norm(nn.Module):
    """norm_fn dispatch: group | instance | none (batch unused by DPVO)."""
    norm_fn: str
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.norm_fn == "group":
            return nn.GroupNorm(num_groups=self.channels // 8,
                                dtype=self.dtype)(x)
        if self.norm_fn == "instance":
            return instance_norm(x)
        if self.norm_fn == "none":
            return x
        raise NotImplementedError(self.norm_fn)


class ResidualBlock(nn.Module):
    """3x3-conv residual block (ref extractor.py:6-55)."""
    planes: int
    norm_fn: str = "instance"
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    dtype=self.dtype, name="conv1")(x)
        y = _Norm(self.norm_fn, self.planes, self.dtype, name="norm1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(y)
        y = _Norm(self.norm_fn, self.planes, self.dtype, name="norm2")(y)
        y = nn.relu(y)

        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        dtype=self.dtype, name="downsample")(x)
            x = _Norm(self.norm_fn, self.planes, self.dtype, name="norm3")(x)

        return nn.relu(x + y)


class BasicEncoder4(nn.Module):
    """/4-resolution encoder (ref extractor.py:200-264).

    Input (N, H, W, 3) normalized images; output (N, H/4, W/4, output_dim).
    """
    output_dim: int = 128
    norm_fn: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.Conv(DIM, (7, 7), strides=2, padding=3, dtype=self.dtype,
                    name="conv1")(x)
        x = _Norm(self.norm_fn, DIM, self.dtype, name="norm1")(x)
        x = nn.relu(x)

        # layer1: 2 blocks @ DIM stride 1
        x = ResidualBlock(DIM, self.norm_fn, 1, self.dtype,
                          name="layer1_0")(x)
        x = ResidualBlock(DIM, self.norm_fn, 1, self.dtype,
                          name="layer1_1")(x)
        # layer2: 2 blocks @ 2*DIM, first stride 2
        x = ResidualBlock(2 * DIM, self.norm_fn, 2, self.dtype,
                          name="layer2_0")(x)
        x = ResidualBlock(2 * DIM, self.norm_fn, 1, self.dtype,
                          name="layer2_1")(x)

        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                       name="conv2")(x)


class BasicEncoder(nn.Module):
    """/8-resolution encoder, kept for parity (ref extractor.py:117-197;
    unused by VONet but part of the public surface)."""
    output_dim: int = 128
    norm_fn: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.Conv(DIM, (7, 7), strides=2, padding=3, dtype=self.dtype,
                    name="conv1")(x)
        x = _Norm(self.norm_fn, DIM, self.dtype, name="norm1")(x)
        x = nn.relu(x)
        x = ResidualBlock(DIM, self.norm_fn, 1, self.dtype, name="layer1_0")(x)
        x = ResidualBlock(DIM, self.norm_fn, 1, self.dtype, name="layer1_1")(x)
        x = ResidualBlock(2 * DIM, self.norm_fn, 2, self.dtype,
                          name="layer2_0")(x)
        x = ResidualBlock(2 * DIM, self.norm_fn, 1, self.dtype,
                          name="layer2_1")(x)
        x = ResidualBlock(4 * DIM, self.norm_fn, 2, self.dtype,
                          name="layer3_0")(x)
        x = ResidualBlock(4 * DIM, self.norm_fn, 1, self.dtype,
                          name="layer3_1")(x)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                       name="conv2")(x)
