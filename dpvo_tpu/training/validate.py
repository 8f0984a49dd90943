"""Training-time validation (ref train.py:28-131): full rollouts on
held-out samples, Umeyama-aligned ATE statistics, trajectory figures."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import lie
from ..utils.evaluation import ate_rmse


def validate(run_rollout, val_samples, logger=None, step=0,
             make_figures=False, fig_dir="runs/val_figs"):
    """run_rollout(batch) -> dict with 'poses' (S, N, 7) estimated inverse
    poses for one sample; val_samples: iterable of prepared batches with
    'poses' GT.

    Logs ate/{mean, median, min, max} like the reference (train.py:111-118).
    """
    ates = []
    for i, sample in enumerate(val_samples):
        out = run_rollout(sample)
        est = np.asarray(lie.se3_inv(jnp.asarray(out["poses"][-1])))
        gt = np.asarray(lie.se3_inv(jnp.asarray(sample["poses"])))
        n = min(len(est), len(gt))
        ates.append(ate_rmse(est[:n], gt[:n], correct_scale=True))

        if make_figures:
            _trajectory_figure(est[:n], gt[:n],
                               f"{fig_dir}/val_{step}_{i}.png")

    if not ates:
        return {}
    stats = {
        "val/ate_mean": float(np.mean(ates)),
        "val/ate_median": float(np.median(ates)),
        "val/ate_min": float(np.min(ates)),
        "val/ate_max": float(np.max(ates)),
    }
    if logger is not None:
        logger.write_dict(stats)
    return stats


def _trajectory_figure(est, gt, path):
    """2D + 3D comparison figures (ref utils/plot.py:4-91)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    import os
    os.makedirs(os.path.dirname(path), exist_ok=True)

    from ..utils.evaluation import umeyama_alignment
    R, t, s = umeyama_alignment(est[:, :3].T, gt[:, :3].T)
    aligned = (s * R @ est[:, :3].T + t).T

    fig = plt.figure(figsize=(10, 5))
    ax = fig.add_subplot(121)
    ax.plot(gt[:, 0], gt[:, 2], "k-", label="GT")
    ax.plot(aligned[:, 0], aligned[:, 2], "b--", label="est")
    ax.legend()
    ax.axis("equal")
    ax3 = fig.add_subplot(122, projection="3d")
    ax3.plot(gt[:, 0], gt[:, 1], gt[:, 2], "k-")
    ax3.plot(aligned[:, 0], aligned[:, 1], aligned[:, 2], "b--")
    fig.savefig(path, dpi=80)
    plt.close(fig)
