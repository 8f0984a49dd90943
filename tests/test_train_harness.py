"""Training-harness contracts: validation computes a real ATE from a
forward-only rollout, and full optimizer-state resume round-trips
(VERDICT r1 items 7/weak#4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpvo_tpu.models.update import Update, DIM
from dpvo_tpu.models.vonet import Patchifier
from dpvo_tpu.parallel.train_step import (TrainState, make_eval_step,
                                          make_optimizer, make_train_step)
from dpvo_tpu.training import rollout as R
from dpvo_tpu.training.validate import validate
from dpvo_tpu.utils.checkpoint import load_train_state, save_train_state


def tiny_setup():
    N, H, W, M, S = 5, 32, 48, 4, 3
    h, w = H // 4, W // 4
    K = N * M
    patchifier = Patchifier(3, dtype=jnp.float32)
    update_mod = Update(3, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    p_params = patchifier.init(key, jnp.zeros((N, H, W, 3)),
                               jnp.ones((N, M, 2)) * 4.0)
    u_params = update_mod.init(
        key, jnp.zeros((8, DIM)), jnp.zeros((8, DIM)),
        jnp.zeros((8, 2 * 49 * 9)), jnp.zeros((8,), jnp.int32),
        jnp.zeros((8,), jnp.int32), jnp.zeros((8,), jnp.int32))
    params = {"patchify": p_params, "update": u_params}

    rng = np.random.default_rng(0)
    sch = R.build_schedule(N, M, S, rng)
    batch = {
        "images": jnp.asarray(rng.normal(size=(1, N, H, W, 3)),
                              jnp.float32),
        "poses": jnp.tile(jnp.zeros((N, 7)).at[:, 6].set(1.0)[None],
                          (1, 1, 1)),
        "disps": jnp.ones((1, N, h, w), jnp.float32),
        "intrinsics": jnp.tile(jnp.asarray([[40.0, 40.0, w / 2, h / 2]]),
                               (1, N, 1)),
        "coords": jnp.asarray(rng.uniform(2, min(h, w) - 2, (1, N, M, 2)),
                              jnp.float32),
        "depth_init": jnp.asarray(rng.uniform(0.5, 2.0, (1, K)),
                                  jnp.float32),
        "sch_ii": jnp.asarray(sch.ii), "sch_jj": jnp.asarray(sch.jj),
        "sch_kk": jnp.asarray(sch.kk),
        "sch_active": jnp.asarray(sch.active),
        "sch_fresh": jnp.asarray(sch.fresh),
        "sch_intro": jnp.asarray(sch.intro),
    }
    return patchifier, update_mod, params, batch, (N, M, S)


def test_validation_computes_ate():
    patchifier, update_mod, params, batch, (N, M, S) = tiny_setup()
    eval_step = make_eval_step(patchifier, update_mod, steps=S, M=M)
    est, metrics = eval_step(params, batch)
    assert est.shape == (1, S, N, 7)
    assert np.isfinite(np.asarray(est)).all()

    sample = {"_batch": batch, "poses": np.asarray(batch["poses"][0])}

    def run_rollout(s):
        e, _ = eval_step(params, s["_batch"])
        return {"poses": np.asarray(e[0])}

    stats = validate(run_rollout, [sample])
    # a REAL ate number must come out (r1's hook iterated an empty list)
    assert "val/ate_mean" in stats
    assert np.isfinite(stats["val/ate_mean"])


def test_train_state_resume_roundtrip(tmp_path):
    patchifier, update_mod, params, batch, (N, M, S) = tiny_setup()
    tx = make_optimizer(1e-4, steps=100)
    state = TrainState(params, tx.init(params), jnp.int32(0))
    step_fn = make_train_step(patchifier, update_mod, tx, steps=S, M=M,
                              structure_only=False)
    state, _ = step_fn(state, batch)
    state, _ = step_fn(state, batch)

    path = str(tmp_path / "state.npz")
    save_train_state(path, state)

    template = TrainState(params, tx.init(params), jnp.int32(0))
    restored = load_train_state(path, template)
    assert int(restored.step) == 2
    # every optimizer-state leaf must round-trip exactly (momenta etc.)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # structure mismatch must be detected loudly
    with pytest.raises(ValueError):
        load_train_state(path, TrainState(params, (), jnp.int32(0)))
