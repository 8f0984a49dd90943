"""MFU / roofline analysis for the two hot kernels at the bench
operating points (VERDICT r2 weak#5): corr_pallas_fused and
ba_iterative.

For each kernel this script
  1. counts useful FLOPs and minimum HBM bytes analytically,
  2. measures steady-state ms/call with the trap-proof microbench
     harness,
  3. prints achieved TFLOP/s + GB/s as a fraction of (a) v5e spec
     peaks and (b) an EMPIRICAL VPU peak measured in the same process
     (a pure in-VMEM fp32 multiply-add chain — what the corr kernel's
     instruction mix could at best sustain).

v5e spec constants (public): 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
The VPU has no published FLOP/s figure; the empirical peak below is
the honest denominator for a VPU-bound kernel.

Usage:  python scripts/dev/roofline.py [edges ...]
        (default operating points: 14336 merge / 49152 retain)
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts/dev")

import jax
import jax.numpy as jnp
import numpy as np

from microbench import timed

from dpvo_tpu.ops import corr_pallas as cp
from dpvo_tpu.ops import ba

SPEC_MXU_BF16 = 197e12         # v5e peak bf16 TFLOP/s (public spec)
SPEC_HBM = 819e9               # v5e HBM GB/s (public spec)

C = 128
P2 = 9
D = cp.D                       # 8 tap rows
MEM = 20                       # fmap ring slots at the bench point
H1, W1 = 120, 160
H2, W2 = 30, 40


def vpu_peak_tflops():
    """Empirical fp32 VPU peak: a chain of fused multiply-adds on a
    VMEM-resident (512, 1024) block, reps inside one jitted loop."""
    x = jnp.ones((512, 1024), jnp.float32)
    a = jnp.float32(1.000001)

    def fma_chain(x):
        for _ in range(64):
            x = x * a + 1e-9
        return x

    ms = timed("vpu fma chain x64", fma_chain, x,
                     reps=64)
    flops = 512 * 1024 * 64 * 2
    return flops / (ms * 1e-3)


def corr_point(E):
    Hp1, Wp1 = cp.padded_hw(H1, W1)
    Hp2, Wp2 = cp.padded_hw(H2, W2)
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((E, P2, C)), jnp.bfloat16)
    f1 = jnp.asarray(rng.standard_normal((MEM, Hp1, Wp1, C)),
                     jnp.bfloat16)
    f2 = jnp.asarray(rng.standard_normal((MEM, Hp2, Wp2, C)),
                     jnp.bfloat16)
    coords = jnp.asarray(
        np.stack([rng.uniform(2, W1 - 3, (E, 3, 3)),
                  rng.uniform(2, H1 - 3, (E, 3, 3))], axis=1),
        jnp.float32)
    tf = jnp.asarray(rng.integers(0, MEM, (E // cp.TILE,)), jnp.int32)
    tf = jnp.sort(tf)

    def run(tf):
        # v12 core explicitly: the FLOP/byte model below describes its
        # structure (v13 adds the in-kernel gather + encoder matmul,
        # measured separately in v13_bench.py)
        return cp.corr_pallas_fused(g, f1, f2, coords, tf,
                                    out_dtype=jnp.bfloat16, version=12)

    ms = timed(f"corr_pallas_fused E={E}", run, tf,
                     reps=8)

    # useful FLOPs per (edge, pixel, level): channel dot over the 8x16
    # aligned window (2*8*16*C), y-blend (3*7*16... counted exact
    # below), x-blend matmul (2*7*16*7 in v4's 8-wide form: 2*7*8*7).
    per_ep = 2 * D * 16 * C + 3 * (D - 1) * D + 2 * (D - 1) * D * (D - 1)
    flops = E * P2 * 2 * per_ep
    # minimum HBM bytes: each fmap frame DMA'd once per contiguous
    # group (>= once per ring slot), g rows once, coords/meta, output.
    bytes_min = (MEM * (Hp1 * Wp1 + Hp2 * Wp2) * C * 2
                 + E * P2 * C * 2          # g rows
                 + E * (2 * P2 * 4 + 10 * P2 * 4)   # coords + smem meta
                 + E * 2 * P2 * 7 * 7 * 2)          # output bf16
    return ms, flops, bytes_min


def ba_point(E, n_cap=16, k_cap=4096):
    rng = np.random.default_rng(1)
    N = 64
    K = 4096
    P = 3
    poses = jnp.asarray(
        np.concatenate([rng.standard_normal((N, 3)) * 0.1,
                        np.tile([0, 0, 0, 1.0], (N, 1))], axis=1),
        jnp.float32)
    patches = jnp.asarray(rng.uniform(10, 100, (K, 3, P, P)),
                          jnp.float32)
    intr = jnp.asarray([120.0, 120.0, 80.0, 60.0], jnp.float32)
    ii = jnp.asarray(rng.integers(0, N - 1, (E,)), jnp.int32)
    jj = jnp.asarray(rng.integers(0, N - 1, (E,)), jnp.int32)
    kk = jnp.sort(jnp.asarray(rng.integers(0, K, (E,)), jnp.int32))
    valid = jnp.ones((E,), bool)
    target = jnp.asarray(rng.uniform(0, 150, (E, 2)), jnp.float32)
    weight = jnp.asarray(rng.uniform(0, 1, (E, 2)), jnp.float32)

    def run(target):
        return ba.ba_iterative(poses, patches, intr, target, weight,
                               jnp.float32(1e-4), ii, jj, kk, valid,
                               jnp.int32(2), jnp.int32(N),
                               n_cap=n_cap, k_cap=k_cap, iterations=2)

    ms = timed(f"ba_iterative 2it E={E}", run, target,
                     reps=8)

    # dominant FLOPs (per GN iteration): per-edge Jacobian products and
    # the dense one-hot J_eff assembly matmuls (E,2,6n)x..., Hessian
    # (6n,E*2)x(E*2,6n), plus the CG/solve small terms.  Count the
    # E-proportional matmuls exactly; the (6n)^2-sized solve is minor.
    n6 = 6 * n_cap
    # B assembly: (n6, 2E) @ (2E, n6) = 2 * n6^2 * 2E flops — dominant.
    flops_iter = 2 * n6 * n6 * 2 * E + 2 * E * 2 * n6 * 4
    flops = 2 * flops_iter
    bytes_min = (E * (2 + 2 + 4 * 3) * 4 * 2   # target/weight/idx read
                 + K * 3 * P * P * 4 * 2       # patch table r/w
                 + E * 2 * n6 * 4)             # J_eff
    return ms, flops, bytes_min


def report(name, ms, flops, bytes_min, vpu_peak=None):
    tfs = flops / (ms * 1e-3) / 1e12
    gbs = bytes_min / (ms * 1e-3) / 1e9
    line = (f"{name:32s} {ms:8.2f} ms  {tfs:7.3f} TFLOP/s "
            f"({100 * tfs * 1e12 / SPEC_MXU_BF16:5.2f}% of MXU spec")
    if vpu_peak:
        line += f", {100 * tfs * 1e12 / vpu_peak:5.1f}% of meas. VPU peak"
    line += (f")  >= {gbs:6.1f} GB/s "
             f"({100 * gbs * 1e9 / SPEC_HBM:5.2f}% of HBM spec)")
    print(line, flush=True)


if __name__ == "__main__":
    pts = [int(a) for a in sys.argv[1:]] or [14336, 49152]
    print(f"devices: {jax.devices()}", flush=True)
    vpu = vpu_peak_tflops()
    print(f"empirical VPU fp32 peak: {vpu / 1e12:.2f} TFLOP/s", flush=True)
    for E in pts:
        ms, fl, by = corr_point(E)
        report(f"corr_pallas_fused E={E}", ms, fl, by, vpu_peak=vpu)
    for E in pts:
        ms, fl, by = ba_point(E)
        report(f"ba_iterative 2it E={E}", ms, fl, by)
