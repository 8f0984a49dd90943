"""Bundle adjustment tests: convergence on synthetic problems.

Strategy (SURVEY.md §4): build a ground-truth scene, compute exact
reprojection targets, perturb poses/depths, and verify GN recovers them.
"""
import numpy as np
import jax
import jax.numpy as jnp

from dpvo_tpu.ops import lie, projective as pops, ba

KEY = jax.random.PRNGKey(11)


def build_problem(key, n_frames=6, patches_per_frame=24, P=3):
    """Ground-truth scene + exact targets for all pairwise edges."""
    ks = jax.random.split(key, 8)
    # smooth forward trajectory with small rotations
    xi = jax.random.normal(ks[0], (n_frames, 6)) * 0.03
    xi = xi.at[:, 0].add(jnp.arange(n_frames) * 0.12)  # translate in x
    poses_gt = lie.se3_exp(xi)

    K = n_frames * patches_per_frame
    cx = jax.random.uniform(ks[1], (K, 1, 1), minval=25, maxval=135)
    cy = jax.random.uniform(ks[2], (K, 1, 1), minval=20, maxval=100)
    d = jax.random.uniform(ks[3], (K, 1, 1), minval=0.5, maxval=1.5)
    off = jnp.arange(P, dtype=jnp.float32) - P // 2
    patches_gt = jnp.stack([
        jnp.broadcast_to(cx + off[None, None, :], (K, P, P)),
        jnp.broadcast_to(cy + off[None, :, None], (K, P, P)),
        jnp.broadcast_to(d, (K, P, P))], axis=1)

    intr = jnp.array([120.0, 120.0, 80.0, 60.0])
    intr_frames = jnp.tile(intr[None], (n_frames, 1))

    # edges: each patch into every frame within +-2
    ii_l, jj_l, kk_l = [], [], []
    for fi in range(n_frames):
        for fj in range(n_frames):
            if fi != fj and abs(fi - fj) <= 2:
                for m in range(patches_per_frame):
                    ii_l.append(fi)
                    jj_l.append(fj)
                    kk_l.append(fi * patches_per_frame + m)
    ii = jnp.array(ii_l)
    jj = jnp.array(jj_l)
    kk = jnp.array(kk_l)

    coords = pops.transform(poses_gt, patches_gt, intr_frames, ii, jj, kk)
    target = coords[:, P // 2, P // 2]  # exact center reprojections

    return poses_gt, patches_gt, intr, intr_frames, target, ii, jj, kk


def ate(poses_a, poses_b):
    """RMS translation error after first-pose alignment."""
    rel_a = lie.se3_mul(poses_a, lie.se3_inv(poses_a[:1]))
    rel_b = lie.se3_mul(poses_b, lie.se3_inv(poses_b[:1]))
    return float(jnp.sqrt(jnp.mean(
        jnp.sum((rel_a[:, :3] - rel_b[:, :3]) ** 2, axis=-1))))


class TestIterativeBA:
    def test_recovers_perturbed_poses(self):
        (poses_gt, patches_gt, intr, _, target, ii, jj, kk) = build_problem(
            KEY)
        n_frames = poses_gt.shape[0]

        # perturb all but the first two poses
        noise = jax.random.normal(jax.random.PRNGKey(5),
                                  (n_frames, 6)) * 0.02
        noise = noise.at[:2].set(0.0)
        poses0 = lie.se3_retr(poses_gt, noise)

        err0 = ate(poses0, poses_gt)
        E = ii.shape[0]
        weight = jnp.ones((E, 2))
        valid = jnp.ones((E,), dtype=bool)

        poses1, patches1 = ba.ba_iterative(
            poses0, patches_gt, intr, target, weight, 1e-4,
            ii, jj, kk, valid, jnp.int32(1), jnp.int32(n_frames),
            n_cap=8, k_cap=256, iterations=6)

        err1 = ate(poses1, poses_gt)
        assert err1 < 0.2 * err0, (err0, err1)

    def test_recovers_perturbed_depths(self):
        (poses_gt, patches_gt, intr, _, target, ii, jj, kk) = build_problem(
            KEY)
        n_frames = poses_gt.shape[0]
        K = patches_gt.shape[0]

        dnoise = jax.random.uniform(jax.random.PRNGKey(6), (K, 1, 1),
                                    minval=0.7, maxval=1.4)
        patches0 = patches_gt.at[:, 2].multiply(dnoise)

        E = ii.shape[0]
        poses1, patches1 = ba.ba_iterative(
            poses_gt, patches0, intr, target, jnp.ones((E, 2)), 1e-4,
            ii, jj, kk, jnp.ones((E,), bool), jnp.int32(1),
            jnp.int32(n_frames), n_cap=8, k_cap=256, iterations=8)

        d_err0 = float(jnp.abs(patches0[:, 2, 1, 1]
                               - patches_gt[:, 2, 1, 1]).mean())
        d_err1 = float(jnp.abs(patches1[:, 2, 1, 1]
                               - patches_gt[:, 2, 1, 1]).mean())
        assert d_err1 < 0.3 * d_err0, (d_err0, d_err1)

    def test_invalid_edges_ignored(self):
        (poses_gt, patches_gt, intr, _, target, ii, jj, kk) = build_problem(
            KEY, n_frames=4, patches_per_frame=8)
        n_frames = 4
        E = ii.shape[0]

        # poison half the targets but mark them invalid
        target_bad = target.at[E // 2:].set(1e6)
        valid = jnp.arange(E) < E // 2

        poses1, _ = ba.ba_iterative(
            poses_gt, patches_gt, intr, target_bad, jnp.ones((E, 2)), 1e-4,
            ii, jj, kk, valid, jnp.int32(1), jnp.int32(n_frames),
            n_cap=6, k_cap=64, iterations=2)
        # GT poses + exact targets on the valid half => no motion
        np.testing.assert_allclose(np.asarray(poses1), np.asarray(poses_gt),
                                   atol=1e-3)

    def test_fixed_poses_stay_fixed(self):
        (poses_gt, patches_gt, intr, _, target, ii, jj, kk) = build_problem(
            KEY, n_frames=5, patches_per_frame=8)
        E = ii.shape[0]
        noise = jax.random.normal(jax.random.PRNGKey(7), (5, 6)) * 0.03
        poses0 = lie.se3_retr(poses_gt, noise)
        poses1, _ = ba.ba_iterative(
            poses0, patches_gt, intr, target, jnp.ones((E, 2)), 1e-4,
            ii, jj, kk, jnp.ones((E,), bool), jnp.int32(2), jnp.int32(5),
            n_cap=4, k_cap=64, iterations=2)
        np.testing.assert_allclose(np.asarray(poses1[:2]),
                                   np.asarray(poses0[:2]))

    def test_structure_only_window(self):
        """t1 == t0 -> only depths update (cuda_ba branch :521-531)."""
        (poses_gt, patches_gt, intr, _, target, ii, jj, kk) = build_problem(
            KEY, n_frames=4, patches_per_frame=8)
        E = ii.shape[0]
        patches0 = patches_gt.at[:, 2].multiply(1.3)
        poses1, patches1 = ba.ba_iterative(
            poses_gt, patches0, intr, target, jnp.ones((E, 2)), 1e-4,
            ii, jj, kk, jnp.ones((E,), bool), jnp.int32(4), jnp.int32(4),
            n_cap=4, k_cap=64, iterations=4)
        np.testing.assert_allclose(np.asarray(poses1), np.asarray(poses_gt))
        d_err0 = float(jnp.abs(patches0[:, 2, 1, 1]
                               - patches_gt[:, 2, 1, 1]).mean())
        d_err1 = float(jnp.abs(patches1[:, 2, 1, 1]
                               - patches_gt[:, 2, 1, 1]).mean())
        assert d_err1 < 0.5 * d_err0


class TestDifferentiableBA:
    def test_reduces_reprojection_error(self):
        (poses_gt, patches_gt, intr, intr_f, target, ii, jj,
         kk) = build_problem(KEY)
        n_frames = poses_gt.shape[0]
        E = ii.shape[0]

        noise = jax.random.normal(jax.random.PRNGKey(8),
                                  (n_frames, 6)) * 0.02
        noise = noise.at[0].set(0.0)
        poses0 = lie.se3_retr(poses_gt, noise)

        bounds = jnp.array([-64.0, -64.0, 160 + 64.0, 120 + 64.0])
        valid = jnp.ones((E,), bool)

        def reproj_err(poses, patches):
            c = pops.transform(poses, patches, intr_f, ii, jj, kk)
            return float(jnp.linalg.norm(target - c[:, 1, 1],
                                         axis=-1).mean())

        err0 = reproj_err(poses0, patches_gt)
        poses1, patches1 = poses0, patches_gt
        for _ in range(4):
            poses1, patches1 = ba.ba_differentiable(
                poses1, patches1, intr_f, target, jnp.ones((E, 2)), 1e-4,
                ii, jj, kk, valid, bounds, ep=10.0, fixedp=1, k_cap=256)
        err1 = reproj_err(poses1, patches1)
        assert err1 < 0.5 * err0, (err0, err1)

    def test_gradients_flow(self):
        (poses_gt, patches_gt, intr, intr_f, target, ii, jj,
         kk) = build_problem(KEY, n_frames=4, patches_per_frame=6)
        E = ii.shape[0]
        bounds = jnp.array([-64.0, -64.0, 160 + 64.0, 120 + 64.0])

        def loss(weights, targets):
            p1, _ = ba.ba_differentiable(
                poses_gt, patches_gt, intr_f, targets, weights, 1e-4,
                ii, jj, kk, jnp.ones((E,), bool), bounds, ep=10.0,
                fixedp=1, k_cap=64)
            return jnp.sum(p1[:, :3] ** 2)

        g_w, g_t = jax.grad(loss, argnums=(0, 1))(
            jnp.ones((E, 2)), target + 1.0)
        assert np.all(np.isfinite(np.asarray(g_w)))
        assert np.all(np.isfinite(np.asarray(g_t)))
        assert np.abs(np.asarray(g_t)).sum() > 0

    def test_structure_only(self):
        (poses_gt, patches_gt, intr, intr_f, target, ii, jj,
         kk) = build_problem(KEY, n_frames=4, patches_per_frame=6)
        E = ii.shape[0]
        bounds = jnp.array([-64.0, -64.0, 160 + 64.0, 120 + 64.0])
        patches0 = patches_gt.at[:, 2].multiply(1.2)
        poses1, patches1 = ba.ba_differentiable(
            poses_gt, patches0, intr_f, target, jnp.ones((E, 2)), 1e-4,
            ii, jj, kk, jnp.ones((E,), bool), bounds, ep=10.0, fixedp=1,
            structure_only=True, k_cap=64)
        np.testing.assert_allclose(np.asarray(poses1), np.asarray(poses_gt))
        d_err0 = float(jnp.abs(patches0[:, 2, 1, 1]
                               - patches_gt[:, 2, 1, 1]).mean())
        d_err1 = float(jnp.abs(patches1[:, 2, 1, 1]
                               - patches_gt[:, 2, 1, 1]).mean())
        assert d_err1 < d_err0


class TestGlobalBA:
    """ba_global (EfficentE analog): must match ba_iterative semantics
    without densifying over the pose window (VERDICT r1 item 6)."""

    def test_matches_ba_iterative(self):
        (poses_gt, patches_gt, intr, _, target, ii, jj, kk) = \
            build_problem(KEY)
        n_frames = poses_gt.shape[0]
        noise = jax.random.normal(jax.random.PRNGKey(5),
                                  (n_frames, 6)) * 0.02
        noise = noise.at[:2].set(0.0)
        poses0 = lie.se3_retr(poses_gt, noise)

        E = ii.shape[0]
        weight = jnp.ones((E, 2))
        valid = jnp.ones((E,), bool)
        args = (poses0, patches_gt, intr, target, weight,
                jnp.float32(1e-4), ii.astype(jnp.int32),
                jj.astype(jnp.int32), kk.astype(jnp.int32), valid,
                jnp.int32(1), jnp.int32(n_frames))

        p_it, z_it = ba.ba_iterative(*args, n_cap=8, k_cap=256,
                                     iterations=2)
        p_gl, z_gl = ba.ba_global(*args, n_cap=8, k_cap=256,
                                  iterations=2, cg_iters=64)
        np.testing.assert_allclose(np.asarray(p_gl), np.asarray(p_it),
                                   atol=2e-4)
        # depths are chaotic near the robust-mask boundaries: an edge
        # whose residual sits at the <128px / Z>0.2 cut can flip between
        # the dense and CG solvers under f32 reassociation, moving a few
        # depths by ~1e-2 across the second GN iteration
        np.testing.assert_allclose(np.asarray(z_gl[:, 2, 0, 0]),
                                   np.asarray(z_it[:, 2, 0, 0]),
                                   atol=2e-2)

    def test_recovers_at_scale(self):
        """200-frame window, 16k+ edges: runs in bounded memory and
        reduces pose error (the dense-Jeff design would need ~GBs)."""
        rng = np.random.default_rng(3)
        N, M = 200, 4
        K = N * M
        xi = (rng.normal(size=(N, 6)) * 0.01).astype(np.float32)
        xi[:, 0] += np.arange(N, dtype=np.float32) * 0.05
        poses_gt = lie.se3_exp(jnp.asarray(xi))

        cx = rng.uniform(25, 135, (K, 1, 1))
        cy = rng.uniform(20, 100, (K, 1, 1))
        d = rng.uniform(0.5, 1.5, (K, 1, 1))
        off = np.arange(3, dtype=np.float32) - 1
        patches_gt = jnp.asarray(np.stack([
            np.broadcast_to(cx + off[None, None, :], (K, 3, 3)),
            np.broadcast_to(cy + off[None, :, None], (K, 3, 3)),
            np.broadcast_to(d, (K, 3, 3))], axis=1).astype(np.float32))
        intr = jnp.array([120.0, 120.0, 80.0, 60.0])
        intr_frames = jnp.tile(intr[None], (N, 1))

        ii_l, jj_l, kk_l = [], [], []
        for fi in range(N):
            for dj in (-3, -2, -1, 1, 2, 3):
                fj = fi + dj
                if 0 <= fj < N:
                    for m in range(M):
                        ii_l.append(fi)
                        jj_l.append(fj)
                        kk_l.append(fi * M + m)
        ii = jnp.asarray(ii_l, jnp.int32)
        jj = jnp.asarray(jj_l, jnp.int32)
        kk = jnp.asarray(kk_l, jnp.int32)
        E = ii.shape[0]
        assert E >= 4000  # 200 frames, ~4.7k edges at M=4

        coords = pops.transform(poses_gt, patches_gt, intr_frames,
                                ii, jj, kk)
        target = coords[:, 1, 1]

        noise = jnp.asarray((rng.normal(size=(N, 6)) * 0.01)
                            .astype(np.float32)).at[:2].set(0.0)
        poses0 = lie.se3_retr(poses_gt, noise)

        p_out, _ = ba.ba_global(
            poses0, patches_gt, intr, target, jnp.ones((E, 2)),
            jnp.float32(1e-4), ii, jj, kk, jnp.ones((E,), bool),
            jnp.int32(1), jnp.int32(N), n_cap=256, k_cap=1024,
            iterations=3, cg_iters=64)

        err0 = ate(poses0, poses_gt)
        err1 = ate(p_out, poses_gt)
        assert err1 < 0.5 * err0, (err0, err1)


class TestCouplingAccuracy:
    """ADVICE r1: the kk-sorted cumsum-difference coupling assembly must
    stay segment-accurate at large E (slots late in the sort order see
    the full global prefix with a single-level cumsum)."""

    def test_blocked_cumsum_matches_cumsum_semantics(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2048, 5))
        a = np.asarray(ba._blocked_cumsum(x))
        b = np.cumsum(np.asarray(x, np.float64), axis=0)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)
        # non-multiple-of-block fallback
        y = x[:700]
        np.testing.assert_allclose(np.asarray(ba._blocked_cumsum(y)),
                                   np.asarray(jnp.cumsum(y, axis=0)))

    def test_per_slot_sums_accurate_at_16k(self):
        """Cumsum-difference segment sums vs float64 ground truth at
        E=16384 with large-magnitude values (the regime the depth
        tolerance loosening in r1 was attributed to)."""
        E, D, S = 16384, 8, 1024
        rng = np.random.default_rng(3)
        # sorted segment ids with uneven runs; values up to ~1e3
        ids = np.sort(rng.integers(0, S, E)).astype(np.int32)
        vals = (rng.normal(size=(E, D)) * rng.choice(
            [1.0, 30.0, 1000.0], size=(E, 1))).astype(np.float32)

        idx = np.arange(E, dtype=np.int32)
        run_s = np.full(S, E, np.int64)
        run_e = np.zeros(S, np.int64)
        np.minimum.at(run_s, ids, idx)
        np.maximum.at(run_e, ids, idx + 1)
        nonempty = run_e > run_s
        run_e1 = np.clip(run_e - 1, 0, E - 1)

        cs = np.asarray(ba._blocked_cumsum(jnp.asarray(vals)))
        lo = np.where((run_s > 0)[:, None],
                      cs[np.clip(run_s - 1, 0, E - 1)], 0.0)
        got = np.where(nonempty[:, None], cs[run_e1] - lo, 0.0)

        ref = np.zeros((S, D), np.float64)
        np.add.at(ref, ids, vals.astype(np.float64))

        # blocked accumulation keeps the error segment-local: relative
        # to the largest segment sum, not to the ~1e7 global prefix a
        # single-level cumsum difference is exposed to
        err = np.abs(got - ref).max()
        assert err / max(np.abs(ref).max(), 1.0) < 5e-5, (
            f"relative segment-sum error {err / np.abs(ref).max()}")


class TestPairTable:
    """pair_gid / pair_rep paths must match the plain per-edge Gij
    computation (the engine passes both from its agg_ij metadata)."""

    def _run(self, **kw):
        key = KEY
        (poses_gt, patches_gt, intr, intrf, target,
         ii, jj, kk) = build_problem(key)
        xi = jax.random.normal(jax.random.PRNGKey(3),
                               (poses_gt.shape[0], 6)) * 0.01
        poses0 = lie.se3_mul(lie.se3_exp(xi), poses_gt)
        E = ii.shape[0]
        valid = jnp.ones((E,), bool)
        weight = jnp.ones((E, 2))
        return ba.ba_iterative(
            poses0, patches_gt, intr, target, weight,
            jnp.float32(1e-4), ii, jj, kk, valid,
            jnp.int32(1), jnp.int32(poses_gt.shape[0]),
            n_cap=8, k_cap=256, iterations=2, **kw)

    @staticmethod
    def _pair_meta(ii, jj):
        """Dense pair ranks + a representative edge per rank (the
        engine derives these from its sorted agg_ij metadata)."""
        pair = np.asarray(ii) * 12345 + np.asarray(jj)
        uniq, gid = np.unique(pair, return_inverse=True)
        rep = np.zeros(len(uniq), np.int32)
        for g in range(len(uniq)):
            rep[g] = int(np.argmax(gid == g))
        pair_cap = len(uniq) + 3
        rep = np.concatenate([rep, np.zeros(3, np.int32)])
        return (jnp.asarray(gid, jnp.int32), pair_cap,
                jnp.asarray(rep, jnp.int32))

    def test_pair_gid_matches_plain(self):
        (poses_gt, patches_gt, intr, intrf, target,
         ii, jj, kk) = build_problem(KEY)
        gid, cap, rep = self._pair_meta(ii, jj)
        p0, z0 = self._run()
        p1, z1 = self._run(pair_gid=gid, pair_cap=cap)
        p2, z2 = self._run(pair_gid=gid, pair_cap=cap, pair_rep=rep)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(z2), np.asarray(z1),
                                   atol=1e-6)
