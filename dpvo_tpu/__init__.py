"""dpvo_tpu — TPU-native Deep Patch Visual Odometry / SLAM framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
chansoopark98/Deep-Visual-Odometry-SLAM (DPVO + SLAM stack):

- ``dpvo_tpu.ops``     — Lie groups, projective geometry, patch correlation,
                         bundle adjustment; pure JAX + Pallas TPU kernels.
- ``dpvo_tpu.models``  — CNN feature extractors and the recurrent update
                         operator (flax.linen), bf16-friendly.
- ``dpvo_tpu.engine``  — the stateful SLAM engine with fixed-shape
                         (XLA-static) state and masked edge tables.
- ``dpvo_tpu.data``    — TartanAir / Redwood / stream readers (host side).
- ``dpvo_tpu.parallel``— device-mesh sharding utilities (data parallel
                         training over ICI).
- ``dpvo_tpu.utils``   — timing, grids, trajectory alignment/plotting.

Design stance (vs the CUDA reference): functional state advanced by jitted
pure functions, fp32 islands (Lie ops, BA, SVD) inside an otherwise bf16
graph, and static shapes everywhere (masked fixed-capacity edge tables in
place of dynamic torch.cat lists).
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the engine's graphs (480p conv
# encoders, 49k-edge update step) take minutes to compile cold on TPU;
# cached recompiles are near-instant.  Override dir with
# DPVO_TPU_CACHE_DIR; disable with DPVO_TPU_CACHE_DIR="".
from dpvo_tpu.utils.compile_cache import enable_persistent_cache as \
    _enable_persistent_cache

_enable_persistent_cache()
