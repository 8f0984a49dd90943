"""Measure the jitted training step on the real TPU chip.

The reference's ONLY published perf claims are training-side: AMP is
"~30% faster" with "~40% less GPU memory" than fp32 on an RTX 5090
(/root/reference/README.md:104-105, methods/dpvo/INSTALL.md:238-240).
This script produces the TPU counterpart table: ms/step for the full
jitted train step (encoders + patchify + 18-step recurrent rollout with
differentiable BA + loss + grad + AdamW update, ONE XLA program) in
bf16 vs f32, and steps/s vs per-chip batch size.

Shapes follow the reference training operating point scaled to one
v5e chip: N=15 frames / sample (config/tartan_train.yaml n_frames),
240x320 crop, M=64 patches/frame, 18 rollout steps.

Usage:
    python scripts/dev/train_bench.py [quick]

`quick` drops to 2 timing reps per config (compile still dominates).
Writes a markdown table to stdout; paste into docs/PERF.md.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import os
_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(_HERE)))

from dpvo_tpu.models.vonet import Patchifier
from dpvo_tpu.models.update import Update, DIM
from dpvo_tpu.parallel.train_step import (TrainState, make_optimizer,
                                          make_train_step)
from dpvo_tpu.training import rollout as R
from dpvo_tpu.ops import lie

QUICK = "quick" in sys.argv[1:]
REPS = 2 if QUICK else 5
STEPS_PER_REP = 2 if QUICK else 4

N, H, W, M, STEPS = 15, 240, 320, 64, 18


def make_batch(rng, B, e_cap):
    """Synthetic batch at the bench shape (train.py::prepare_batch
    semantics, random data — step time does not depend on content)."""
    h, w = H // 4, W // 4
    images = rng.uniform(-0.5, 1.5, (B, N, H, W, 3)).astype(np.float32)
    xi = rng.normal(size=(B, N, 6)).astype(np.float32) * 0.02
    xi[:, :, 0] += np.arange(N, dtype=np.float32) * 0.1
    poses = np.asarray(jax.vmap(
        lambda x: lie.se3_inv(lie.se3_exp(x)))(jnp.asarray(xi)))
    disps = rng.uniform(0.2, 2.0, (B, N, h, w)).astype(np.float32)
    intr = np.tile(np.asarray(
        [[W / 2.0, W / 2.0, W / 4.0, H / 4.0]], np.float32) / 4.0,
        (B, N, 1))
    coords = np.stack([
        rng.integers(1, w - 1, size=(B, N, M)),
        rng.integers(1, h - 1, size=(B, N, M)),
    ], axis=-1).astype(np.float32)
    sch = R.build_schedule(N, M, STEPS, rng)
    sch = R.pad_schedule(sch, e_cap)
    return {
        "images": images, "poses": poses.astype(np.float32),
        "disps": disps, "intrinsics": intr, "coords": coords,
        "depth_init": rng.uniform(0, 1, (B, N * M)).astype(np.float32),
        "sch_ii": sch.ii, "sch_jj": sch.jj, "sch_kk": sch.kk,
        "sch_active": sch.active, "sch_fresh": sch.fresh,
        "sch_intro": sch.intro,
    }


def bench_config(dtype, B, e_cap):
    patchifier = Patchifier(3, dtype=dtype)
    update_mod = Update(3, dtype=dtype)
    key = jax.random.PRNGKey(0)
    p_params = patchifier.init(key, jnp.zeros((1, 64, 64, 3)),
                               jnp.zeros((1, 4, 2)))
    u_params = update_mod.init(
        key, jnp.zeros((8, DIM)), jnp.zeros((8, DIM)),
        jnp.zeros((8, 2 * 49 * 9)), jnp.zeros((8,), jnp.int32),
        jnp.zeros((8,), jnp.int32), jnp.zeros((8,), jnp.int32))
    params = {"patchify": p_params, "update": u_params}
    tx = make_optimizer(1e-4, 1000, scheduler="constant")
    step_fn = make_train_step(patchifier, update_mod, tx,
                              steps=STEPS, M=M)

    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, B, e_cap).items()}
    state = TrainState(params, tx.init(params), jnp.int32(0))

    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch)
    jax.block_until_ready(metrics)
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(STEPS_PER_REP):
            state, metrics = step_fn(state, batch)
        jax.block_until_ready(metrics)
        times.append((time.perf_counter() - t0) / STEPS_PER_REP)
    ms = min(times) * 1e3
    loss = float(metrics["loss"])
    del state, batch
    return ms, compile_s, loss


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    probe = R.build_schedule(N, M, STEPS, np.random.default_rng(0),
                             dropout_p=0.0)
    e_cap = len(probe.ii)
    print(f"schedule edge capacity: {e_cap}", file=sys.stderr)

    rows = []
    for name, dtype, B in [("f32", jnp.float32, 1),
                           ("bf16", jnp.bfloat16, 1),
                           ("bf16", jnp.bfloat16, 2),
                           ("bf16", jnp.bfloat16, 4)]:
        try:
            ms, comp, loss = bench_config(dtype, B, e_cap)
            rows.append((name, B, ms, B / (ms / 1e3), comp, loss))
            print(f"[{name} B={B}] {ms:.1f} ms/step "
                  f"({B / (ms / 1e3):.2f} samples/s), compile {comp:.0f}s, "
                  f"loss {loss:.3f}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — OOM at large B is data
            rows.append((name, B, None, None, None, repr(e)[:80]))
            print(f"[{name} B={B}] FAILED: {e!r}", file=sys.stderr)

    print("\n| precision | batch | ms/step | samples/s | compile s |")
    print("|---|---|---|---|---|")
    for name, B, ms, sps, comp, _ in rows:
        if ms is None:
            print(f"| {name} | {B} | FAILED | - | - |")
        else:
            print(f"| {name} | {B} | {ms:.1f} | {sps:.2f} | {comp:.0f} |")
    f32 = next((r for r in rows if r[0] == "f32" and r[2]), None)
    b16 = next((r for r in rows if r[0] == "bf16" and r[1] == 1 and r[2]),
               None)
    if f32 and b16:
        print(f"\nbf16 speedup over f32 (B=1): {f32[2] / b16[2]:.2f}x "
              f"(reference claims ~30% faster AMP on RTX 5090, "
              f"README.md:104)")


if __name__ == "__main__":
    main()
