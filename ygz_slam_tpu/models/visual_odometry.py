"""VisualOdometry: the frontend state machine.

TPU-native replacement for the reference's VisualOdometry module
(src/Module/VisualOdometry.cpp): the NOT_READY/INITING/GOOD/LOST
state machine (:38-107), monocular initialization (:111-180),
map-point creation with mean-depth-1 rescaling (:220-279),
TrackRefFrame with motion-model fallback (:281-302), the keyframe
policy (>=10 frames AND (rot > 0.1 OR trans > 0.1), :304-321) and
SetKeyframe (:182-218).

Architecture: the host owns only the state machine + slot bookkeeping
(MapServer); each per-frame stage is a jitted device computation over
fixed-shape tensors:
  _jit_detect        pyramid -> Features
  _jit_klt           init-phase KLT tracking
  _jit_init          RANSAC H/F + reconstruct
  _jit_track         sparse align -> patch-align vs map -> pose BA
  _jit_triangulate   new-landmark creation at keyframes
  _jit_mapping       covisibility + local BA + culling
"""
from __future__ import annotations

import dataclasses
import logging
import os
from enum import Enum
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import se3 as se3m
from ..geometry.se3 import SE3
from ..map import state as ms
from ..map.memory import MapServer
from ..map.archive import KeyframeArchive
from ..ops.align import klt_pyramidal
from ..solvers import initializer as init_mod
from ..solvers import ba as bam
from . import frontend as fe
from . import local_mapping as lm
from . import relocalization as reloc
from ..map import vocabulary as voc
from ..map import depth_filter as dfilt
from ..utils import np_se3


log = logging.getLogger("ygz_slam_tpu.vo")

_VOCAB_CACHE = {}

# Packaged real-scale vocabulary (10^4 words, tools/train_vocab.py).
_VOCAB_ASSET = os.path.join(
    os.path.dirname(__file__), "..", "assets", "orbvoc_10k.npz"
)


def _shared_vocabulary(k: int = 8, depth: int = 3,
                       prefer_asset: bool = True):
    """Process-wide ORB vocabulary.

    By default loads the packaged 10^4-word asset (the role of DBoW3's
    pretrained ORBvoc.bin, a missing blob in the reference tree:
    SURVEY §2.3, src/Basic/Frame.cpp:190-201) — a 512-word bootstrap
    saturates once the archive holds more than a few dozen keyframes
    (BoW vectors collide; see docs/vocabulary.md).  Falls back to
    training a small bootstrap on synthetic textures when the asset is
    absent or prefer_asset=False."""
    if prefer_asset and os.path.exists(_VOCAB_ASSET):
        if "asset" not in _VOCAB_CACHE:
            _VOCAB_CACHE["asset"] = voc.load(_VOCAB_ASSET)
        return _VOCAB_CACHE["asset"]
    key = (k, depth)
    if key not in _VOCAB_CACHE:
        import numpy as _np
        from ..ops import fast as _fast, orb as _orb
        from ..utils.synthetic import PlaneScene as _PS
        from ..geometry import PinholeCamera as _PC
        from ..geometry.se3 import SE3 as _SE3

        cam = _PC.create(320.0, 320.0, 160.0, 120.0)
        descs = []
        for i in range(4):
            scene = _PS(cam, plane_z=3.0, seed=1000 + i)
            img = scene.render(_SE3.identity(), (240, 320))
            c = _fast.detect(img, 20.0, cell=12, max_corners=200)
            _, d = _orb.compute(img, c.xy)
            descs.append(_np.asarray(d)[_np.asarray(c.mask)])
        _VOCAB_CACHE[key] = voc.train(
            _np.concatenate(descs), k=k, depth=depth, iters=4
        )
    return _VOCAB_CACHE[key]


class Status(Enum):
    NOT_READY = 0
    INITING = 1
    GOOD = 2
    LOST = 3


class VOType(Enum):
    """Frontend method (legacy system.h:26-30 — declared there, only
    SPARSE_DIRECT implemented; all three are implemented here)."""

    SPARSE_DIRECT = 0      # SVO-style direct alignment (default)
    SPARSE_ORB = 1         # ORB-SLAM-style descriptor matching
    SEMI_DENSE_DIRECT = 2  # LSD-style gradient-pixel direct alignment


class MapType(Enum):
    """Map content (legacy system.h:33-37).  SPARSE: landmarks only.
    SEMI_DENSE: + per-keyframe gradient-pixel depth maps (from the
    Bayesian depth filter).  DENSE: + back-projected depth-image
    clouds per keyframe (RGBD/stereo sensors)."""

    SPARSE = 0
    SEMI_DENSE = 1
    DENSE = 2


@dataclasses.dataclass
class VOOptions:
    """Config defaults mirroring config/default.yaml +
    VisualOdometry::Option (VisualOdometry.h:32-45)."""

    n_levels: int = 3
    detect_threshold: float = 20.0
    grid_cell: int = 16
    feat_budgets: tuple = (160, 64, 32)   # per-level detection budgets
    init_min_features: int = 80           # init.min_features (yaml :45)
    init_check_descriptors: bool = True   # CheckFrameDescriptors
    init_desc_max_dist: int = 100         # (Matcher.cpp:45-84)
    init_min_disparity: float = 20.0      # init.min_disparity (:46)
    init_min_inliers: int = 40            # init.min_inliers (:47)
    min_track_inliers: int = 30           # TrackLocalMap gate (hdr :19)
    track_confirm_frames: int = 2     # hysteresis on the inlier gate: a
                                      # frame only goes LOST after this
                                      # many CONSECUTIVE frames below
                                      # min_track_inliers.  The gate's
                                      # own metric has a +-1-2 count
                                      # noise floor (f32 reduction
                                      # reordering flips which dips
                                      # trip it — round-4 marginality
                                      # note); single-frame dips that
                                      # recover on the next frame are
                                      # tracked through instead of
                                      # resetting the map.
    track_inlier_floor: int = 0       # hard floor: below this the frame
                                      # goes LOST immediately regardless
                                      # of the streak (0 = auto, half
                                      # of min_track_inliers)
    kf_min_frames: int = 10               # keyframe.min_frames
    kf_max_rot: float = 0.1               # keyframe.max_rot (yaml :61)
    kf_max_trans: float = 0.1             # keyframe.max_trans (:62)
    max_alignment_motion: float = 0.2     # Matcher.h:30
    max_step_motion: float = 0.2      # whole-step anti-aliasing gate on
                                      # the pose-BA correction (twist
                                      # norm, MAP units — monocular maps
                                      # are mean-depth-1; raise for
                                      # metric-scale RGBD/stereo or
                                      # low-frame-rate sequences)
    map_K: int = 10
    map_F: int = 256
    map_L: int = 3072                 # >= map_K * map_F: the active
                                      # window can link K*F=2560
                                      # distinct landmarks, and a
                                      # panning camera actually does —
                                      # a 2000-row pool pinned and
                                      # starved triangulation (measured
                                      # on the round-4 benchmark:
                                      # inliers sawtoothed 95->28 with
                                      # zero new landmarks for 4
                                      # keyframes straight)
    local_ba_iters: int = 8
    lost_reset_frames: int = 10
    lost_reloc_after: int = 3         # failed jump-free retries before
                                      # the relocalization cascade
                                      # engages (a reloc recovery lands
                                      # on the matched keyframe's frame
                                      # — a pose jump vs local drift;
                                      # the retry recovers without one)
    stereo_baseline: float = 0.1      # meters (STEREO sensor)
    use_depth_filter: bool = True     # Bayesian seeds for depthless
                                      # features (legacy C22, wired)
    use_vocabulary: bool = True       # BoW for reloc + loop closing
    vocab_asset: bool = True          # load the packaged 10^4-word
                                      # vocabulary (assets/orbvoc_10k);
                                      # False = 512-word bootstrap
    reloc_min_inliers: int = 20
    reloc_top_c: int = 10             # BoW candidates geometrically
                                      # verified per reloc attempt.
                                      # BoW retrieval ranks the true
                                      # twin ~39th at archive=200
                                      # (docs/vocabulary.md); the
                                      # batched P3P verifier is cheap
                                      # on-chip, so verify wide.
    reloc_use_pnp: bool = True        # P3P-RANSAC pose seed (prior-
                                      # free; falls back to the stored
                                      # keyframe pose when degenerate)
    lost_desc_max_dist: int = 64      # Hamming bound for the lost-retry
                                      # descriptor re-verification
    kf_cull_min_window: int = 4       # KeyFrameCulling keeps at least
                                      # this many keyframes
    loop_closing: bool = True         # detect+close loops at keyframes
    loop_min_inliers: int = 25
    archive_map: bool = True          # global tier above the window:
                                      # archive evicted keyframes for
                                      # long-range reloc + loop closing
                                      # (Memory.h:16-56 semantics)
    loop_min_frame_gap: int = 50      # archive loop candidates must be
                                      # this many frames older
    loop_top_c: int = 8               # archive loop candidates
                                      # geometrically verified per
                                      # keyframe (vmapped, near-free)
    loop_min_corr_trans: float = 0.02 # apply an archive loop only when
                                      # the measured correction at the
                                      # new keyframe exceeds one of
                                      # these (map units / rad / |ln
                                      # scale|).  Closing "loops" that
                                      # merely CONFIRM the map injects
                                      # verification noise instead of
                                      # removing drift — measured on
                                      # the round-4 benchmark: 160
                                      # unconditional closures made
                                      # ATE 0.42 vs 0.25 without loop
                                      # closing; the significance gate
                                      # restores the intended sign.
    loop_min_corr_rot: float = 0.01
    loop_min_corr_scale: float = 0.02
    loop_cooldown_frames: int = 30    # frames after an applied closure
                                      # before archive loop detection
                                      # re-arms (the map right after a
                                      # PGO is self-consistent; re-
                                      # measuring it immediately only
                                      # sees the verifier's noise
                                      # floor)
    global_pg_iters: int = 25         # global pose-graph GN iterations
    sim3_loops: bool = True           # 7-DoF (Sim3) global pose graph:
                                      # archive loops also absorb the
                                      # monocular SCALE drift an SE(3)
                                      # graph cannot (note.md:63-66)
    vo_type: VOType = VOType.SPARSE_DIRECT   # system.vo (yaml :10)
    map_type: MapType = MapType.SPARSE       # system.map (yaml :12)
    orb_match_radius: float = 15.0    # SPARSE_ORB projection window
    orb_second_chance: bool = True    # widened re-search before LOST
                                      # (the SearchByBoW-style fallback
                                      # ORB-SLAM tracking uses when the
                                      # motion-model window misses)
    orb_wide_radius_mult: float = 3.0 # window multiplier for it
    orb_max_hamming: int = 80         # projection matching threshold
                                      # (ORB-SLAM's TH_HIGH regime; the
                                      # BoW TH_LOW=50 stays in hamming
                                      # match_nn, Matcher.cpp:250-283)
    async_mapping: bool = True        # run the keyframe mapping pass
                                      # (loop closing + local BA +
                                      # culling) on a worker thread,
                                      # off the frame-return path; all
                                      # state consumers join first, so
                                      # trajectories are identical to
                                      # synchronous mode (the decoupled
                                      # mapping the reference declared,
                                      # system.h:80-83).  Default ON
                                      # since round 5: bitwise parity
                                      # is gated by
                                      # tests/test_async_mapping.py
                                      # and it hides the keyframe-rate
                                      # latency spike from the frame
                                      # return path.
    sd_budget: int = 512              # semi-dense gradient pixels/KF
    sd_cell: int = 8
    sd_min_grad: float = 8.0
    chunk_frames: int = 32            # add_frames on-device scan depth


@dataclasses.dataclass
class TrackResult:
    status: Status
    T_cw: SE3 | None
    n_inliers: int = 0


def _se3_from_params7_np(p) -> SE3:
    """Pure-numpy params7 -> SE3 (wxyz quaternion + t): chunked
    tracking builds per-frame TrackResults WITHOUT per-frame device
    dispatches (each dispatch costs ~ms over a serving tunnel — the
    very cost add_frames amortizes)."""
    p = np.asarray(p, np.float64)
    w, x, y, z = p[:4] / np.linalg.norm(p[:4])
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float32)
    return SE3(R=R, t=np.asarray(p[4:7], np.float32))


class VisualOdometry:
    """Monocular VO over a fixed-capacity tensor map."""

    def __init__(self, cam, opts: VOOptions | None = None):
        self.cam = cam
        self.o = opts or VOOptions()
        o = self.o
        self.server = MapServer(o.map_K, o.map_F, o.map_L)
        self.status = Status.NOT_READY
        self.kf_images = None        # [K, H, W] device array
        self.T_cw = SE3.identity()
        self.velocity = SE3.identity()
        self.prev_pyr = None
        self.prev_T_cw = SE3.identity()
        self.cur_depth = None
        self.cur_right = None
        self.seeds = None            # depth-filter seeds on last KF
        self.seed_kf_slot = -1
        self.seed_feat_idx = None    # feature rows in that KF
        self.stereo_baseline = self.o.stereo_baseline
        self.prev_found = None       # [L] bool landmarks seen last frame
        self.prev_obs_px = None      # [L, 2]
        self.sd = None               # SemiDensePoints on the last KF
        self.semidense_cloud: list = []  # exported [_, 3] np arrays
        self.dense_cloud: list = []      # DENSE map: per-KF clouds
        self.init_pyr = None
        self.init_feats: fe.Features | None = None
        self.frames_since_kf = 0
        self.last_kf_slot = -1
        self.frame_id = -1
        self.lost_count = 0
        self._low_streak = 0         # consecutive sub-gate frames
                                     # (inlier-gate hysteresis)
        self.init_used_h = None   # which RANSAC model bootstrapped
        self._last_reloc_arc_idx = None  # archive row of the last
                                         # successful archive reloc
        self._map_thread = None      # async mapping worker (if any)
        self._map_exc = None
        self._map_pending_pose7 = None
        self._map_fixup_start = 0
        self._last_loop_fid = -10**9  # loop-closure cooldown anchor
        self.trajectory: list[tuple[float, np.ndarray]] = []
        # Per-run counters (the reference glogs these at every stage,
        # SURVEY §5; exposed here as a dict + optional log lines).
        import collections
        self.stats = collections.Counter()
        self.epoch = 0                 # world-frame epoch; a hard
                                       # reset starts a new one, a
                                       # verified cross-epoch archive
                                       # loop MERGES it back
        # Which epoch each logged keyframe fid belongs to.  A merge
        # must rebase ONLY the merged epoch's entries — a min-fid
        # watermark corrupts intermediate epochs after two or more
        # resets (round-3 advisor finding).
        self._fid_epoch: dict[int, int] = {}
        # Keyframe-anchored trajectory (ORB-SLAM SaveTrajectory
        # semantics): each frame records (ts, anchor keyframe id,
        # relative pose T_c_kf), so loop-closure corrections of
        # keyframe poses propagate to the exported trajectory.
        self.traj_rel: list[tuple[float, int, np.ndarray]] = []
        self.kf_pose_log: dict[int, np.ndarray] = {}  # frame id -> pose7
        self._last_kf_fid = -1
        self._last_kf_pose7 = np.asarray(
            [1, 0, 0, 0, 0, 0, 0], np.float32
        )
        self.vocab = (
            _shared_vocabulary(prefer_asset=o.vocab_asset)
            if self.o.use_vocabulary else None
        )
        if self.vocab is not None:
            self.kf_bow = jnp.zeros(
                (o.map_K, self.vocab.n_words), jnp.float32
            )
            self.kf_nodes = jnp.full((o.map_K, o.map_F), -1, jnp.int32)
        self.archive = (
            KeyframeArchive(
                o.map_F,
                self.vocab.n_words if self.vocab is not None else 1,
            ) if o.archive_map else None
        )
        if self.archive is not None:
            self.server.on_evict = self._archive_kf
        self._build_jits()

    # ------------------------------------------------------------------
    def _build_jits(self):
        o, cam = self.o, self.cam

        @jax.jit
        def _detect(pyr, existing_px, existing_mask):
            return fe.detect_multilevel(
                pyr, o.detect_threshold, o.grid_cell, o.feat_budgets,
                existing_px, existing_mask,
            )

        @jax.jit
        def _describe_at(img, px):
            from ..ops import orb as orb_mod
            return orb_mod.compute(img, px)

        @jax.jit
        def _detect_free(pyr):
            return fe.detect_multilevel(
                pyr, o.detect_threshold, o.grid_cell, o.feat_budgets
            )

        @jax.jit
        def _klt(ref_pyr, cur_pyr, px, px_init):
            return klt_pyramidal(ref_pyr, cur_pyr, px, px_init)

        @jax.jit
        def _desc_check(ref_desc, img, px):
            """Descriptor re-check of KLT matches (Matcher::
            CheckFrameDescriptors, Matcher.cpp:45-84): Hamming distance
            between each init feature's descriptor and a descriptor
            freshly computed at its tracked position."""
            from ..ops import orb as orb_mod
            from ..ops.hamming import hamming_distance

            _, desc_cur = orb_mod.compute(img, px)
            return hamming_distance(ref_desc, desc_cur)

        @jax.jit
        def _init(p1, p2, mask, key):
            # Solver boundary: RANSAC H/F + reconstruction operate on
            # ideal-pinhole pixels (identity when no distortion).
            return init_mod.initialize_two_view(
                cam.undistort_px(p1), cam.undistort_px(p2), mask,
                cam.K, key, min_good=o.init_min_inliers,
            )

        @jax.jit
        def _two_view_ba(T1, T2, pts, px1, px2, mask):
            return bam.two_view_ba(T1, T2, pts, px1, px2, mask, cam)

        def _track(prev_pyr, cur_pyr, prev_T_cw7, T_pred7, mstate,
                   kf_images, prev_found, prev_obs_px):
            prev_T_cw = SE3.from_params7(prev_T_cw7)
            T_pred = SE3.from_params7(T_pred7)
            # (a) sparse-direct alignment against the previous frame:
            # its "features with depth" are last frame's landmark
            # observations, depth = landmark z in the previous camera.
            z_prev = prev_T_cw.apply(mstate.pt_pos)[:, 2]
            ref_mask = prev_found & mstate.pt_valid & (z_prev > 0.05)
            # Sparse alignment runs on a FIXED-SIZE selection of the
            # tracked landmarks, not all map_L rows: the fused mega
            # kernel holds every row's window stack in VMEM at once
            # (its GN loop reduces over all points per iteration), so
            # map-capacity-sized inputs blow the 16 MB scoped-VMEM
            # budget on real hardware (measured: [3072, .] operands
            # asked for 85 MB).  ~200-400 landmarks are tracked per
            # frame (the reference aligns exactly its tracked feature
            # set too, SparseImgAlign.cpp) — 256 rows = the per-KF
            # feature budget; measured VMEM: 512 rows still exceeded
            # the 16 MB scoped budget by 3.5 MB, 256 fits with ~6 MB
            # headroom.
            NS = min(256, o.map_L)
            _, sel = jax.lax.top_k(ref_mask.astype(jnp.float32), NS)
            tr = fe.track_ref_frame(
                prev_pyr, cur_pyr, cam, prev_T_cw,
                prev_obs_px[sel], z_prev[sel], ref_mask[sel], T_pred,
                max_motion=o.max_alignment_motion,
            )
            # (b) VISIBLE-SUBSET selection (FindCandidates,
            # LocalMapping.cpp:47-80): project all landmarks cheaply,
            # then run the EXPENSIVE per-landmark work — affine-warped
            # reference-patch gathers and the fused align2d kernel —
            # only on the best NSV in-frustum rows.  Round-5 device
            # trace: patch building over all map_L=3072 rows cost
            # ~21 ms/frame of device time (the vmapped keyframe-image
            # gather lowers to full-image one-hot contractions per
            # landmark); per-frame cost must scale with the visible
            # set, not map capacity.  Ties preferring proven landmarks
            # ((found+1)/(visible+1) — neutral prior for fresh
            # triangulations so they still earn observations).
            NSV = min(512, o.map_L)
            pc_all = tr.T_cw.apply(mstate.pt_pos)
            px_all = cam.camera_to_pixel(pc_all)
            H0, W0 = cur_pyr[0].shape
            mb = 8.0
            vis = (
                mstate.pt_valid & (pc_all[:, 2] > 0.05)
                & (px_all[:, 0] >= mb) & (px_all[:, 1] >= mb)
                & (px_all[:, 0] < W0 - mb) & (px_all[:, 1] < H0 - mb)
            )
            qual = ((mstate.pt_found + 1).astype(jnp.float32)
                    / (mstate.pt_visible + 1).astype(jnp.float32))
            _, sel2 = jax.lax.top_k(
                jnp.where(vis, 1.0 + qual, 0.0), NSV
            )
            sel_ok = vis[sel2]
            patches, patch_ok, search_lvl = (
                fe.reference_patches_for_landmarks(
                    kf_images, mstate.kf_pose7,
                    mstate.feat_px.reshape(-1, 2),
                    mstate.feat_level.reshape(-1),
                    mstate.pt_ref_feat[sel2], mstate.pt_pos[sel2],
                    sel_ok, cam, tr.T_cw, max_level=o.n_levels - 1,
                )
            )
            # (c) map tracking + pose-only BA on the subset.
            tm_s = fe.track_local_map(
                cur_pyr, cam, tr.T_cw, mstate.pt_pos[sel2], sel_ok,
                patches, patch_ok, search_lvl,
                max_step_motion=o.max_step_motion,
            )
            # Scatter subset results back to map-capacity arrays (the
            # state machine, counters and keyframe assembly all index
            # by landmark row).
            L = o.map_L
            tm = fe.TrackMapResult(
                T_cw=tm_s.T_cw,
                n_inliers=tm_s.n_inliers,
                candidate=jnp.zeros(L, bool).at[sel2].set(
                    tm_s.candidate & sel_ok),
                found=jnp.zeros(L, bool).at[sel2].set(
                    tm_s.found & sel_ok),
                obs_px=jnp.zeros((L, 2), jnp.float32).at[sel2].set(
                    tm_s.obs_px),
            )
            # (d) landmark statistics (MapPoint _cnt_visible/_cnt_found).
            mstate = mstate._replace(
                pt_visible=mstate.pt_visible + tm.candidate.astype(jnp.int32),
                pt_found=mstate.pt_found + tm.found.astype(jnp.int32),
            )
            return tm, mstate, tr.ok

        def _track_chunk(imgs, prev_pyr, prev_T7, vel7, mstate,
                         kf_images, prev_found, prev_obs_px, fsk,
                         T_kf7, low_streak, seeds, seed_img, T_seed7):
            """Scan a whole chunk of ordinary frames ON DEVICE: one
            dispatch advances `imgs.shape[0]` frames (the per-frame
            host API pays the fixed dispatch cost per frame — measured
            ~26 ms over the serving tunnel — per CHUNK here).  The
            keyframe-need and lost gates are evaluated in-scan; the
            host truncates at the first flagged frame and replays it
            through the per-frame path, so chunked semantics are
            identical to repeated add_frame."""

            hard = o.track_inlier_floor or max(
                1, o.min_track_inliers // 2
            )

            def body(carry, img):
                done, inner = carry
                # After the first keyframe/lost flag the host is going
                # to truncate the chunk and discard every later slot's
                # outputs — skip their compute entirely (lax.cond is a
                # REAL branch on the TPU scalar core).  Without this,
                # every cut chunk re-ran all `chunk` padded slots: the
                # round-5 system trace measured 33 chunk executions x
                # 64 slots for ~300 accepted frames (~7x device waste
                # at keyframe-dense stream rates).
                inner, ys = jax.lax.cond(
                    done, _body_skip, _body_live, inner, img
                )
                (_T7, _v7, _inl, kf_needed, lost) = ys[:5]
                return (done | kf_needed | lost, inner), ys

            def _body_skip(inner, img):
                (pyr_p, T7_p, vel7, mstate, found_p, obs_p, fsk,
                 streak, seeds) = inner
                ys = (T7_p, vel7, jnp.zeros((), jnp.int32),
                      jnp.zeros((), bool), jnp.zeros((), bool),
                      jnp.zeros_like(found_p),
                      jnp.zeros_like(found_p), obs_p, streak, seeds)
                return inner, ys

            def _body_live(carry, img):
                (pyr_p, T7_p, vel7, mstate, found_p, obs_p, fsk,
                 streak, seeds) = carry
                pyr = fe.preprocess(img, o.n_levels)
                T_pred = SE3.from_params7(vel7) @ SE3.from_params7(T7_p)
                tm, mstate, _ok = _track(
                    pyr_p, pyr, T7_p, T_pred.params7(), mstate,
                    kf_images, found_p, obs_p,
                )
                T_cw = tm.T_cw
                T7 = T_cw.params7()
                vel7n = T_cw.compose(
                    SE3.from_params7(T7_p).inverse()).params7()
                # Inlier-gate hysteresis, identical to _track_frame:
                # LOST below the hard floor immediately, or after
                # track_confirm_frames consecutive sub-gate frames.
                low = tm.n_inliers < o.min_track_inliers
                streak = jnp.where(low, streak + 1, 0)
                lost = (tm.n_inliers < hard) | (
                    streak >= o.track_confirm_frames
                )
                fsk = fsk + 1
                delta = se3m.log(
                    T_cw.compose(SE3.from_params7(T_kf7).inverse()))
                kf_needed = (fsk >= o.kf_min_frames) & (~low) & (
                    (jnp.linalg.norm(delta[3:]) > o.kf_max_rot)
                    | (jnp.linalg.norm(delta[:3]) > o.kf_max_trans)
                )
                if seeds is not None:
                    T_cur_ref = T_cw.compose(
                        SE3.from_params7(T_seed7).inverse())
                    seeds = dfilt.update_seeds_from_frame(
                        seeds, seed_img, pyr[0], cam, T_cur_ref,
                    )
                carry = (pyr, T7, vel7n, mstate, tm.found, tm.obs_px,
                         fsk, streak, seeds)
                ys = (T7, vel7n, tm.n_inliers, kf_needed, lost,
                      tm.found, tm.candidate, tm.obs_px, streak, seeds)
                return carry, ys

            carry0 = (jnp.zeros((), bool),
                      (prev_pyr, prev_T7, vel7, mstate, prev_found,
                       prev_obs_px, fsk, low_streak, seeds))
            (done, inner), ys = jax.lax.scan(body, carry0, imgs)
            return inner, ys

        @jax.jit
        def _accept_counters(mstate, cand, found, j):
            """Map-point visible/found counters for the accepted
            chunk prefix [0, j) (truncated chunks only; full chunks
            take the scan's final carry)."""
            w = jnp.arange(cand.shape[0])[:, None] < j
            return mstate._replace(
                pt_visible=mstate.pt_visible
                + jnp.sum(cand & w, axis=0).astype(jnp.int32),
                pt_found=mstate.pt_found
                + jnp.sum(found & w, axis=0).astype(jnp.int32),
            )

        self._jit_track_chunk = jax.jit(_track_chunk)
        self._jit_accept_counters = _accept_counters

        @jax.jit
        def _track_with_seeds(prev_pyr, pyr, prev_T7, T_pred7, mstate,
                              kf_images, found, obs, seeds, seed_slot):
            """Per-frame tracking + depth-filter seed refinement in
            ONE dispatch (round-5: the latency path paid two — the
            chunked scan already folds both; the seed keyframe's image
            and pose are sliced in-program to avoid eager host ops)."""
            tm, mstate, ok = _track(
                prev_pyr, pyr, prev_T7, T_pred7, mstate, kf_images,
                found, obs,
            )
            T_seed = SE3.from_params7(mstate.kf_pose7[seed_slot])
            T_cur_ref = tm.T_cw.compose(T_seed.inverse())
            seeds = dfilt.update_seeds_from_frame(
                seeds, kf_images[seed_slot], pyr[0], cam, T_cur_ref,
            )
            return tm, mstate, ok, seeds

        self._jit_track_with_seeds = _track_with_seeds

        if o.vo_type is VOType.SPARSE_ORB:
            from . import orb_tracking as orbtrack

            @jax.jit
            def _track_orb(cur_pyr, T_pred7, mstate):
                """SPARSE_ORB frame tracking: detect ORB features,
                two-pass projection matching + pose-only BA (no
                photometric alignment anywhere)."""
                T_pred = SE3.from_params7(T_pred7)
                feats = fe.detect_multilevel(
                    cur_pyr, o.detect_threshold, o.grid_cell,
                    o.feat_budgets,
                )
                # No rotation-histogram gate here: map-point ->
                # feature matching has no stable reference angle (a
                # landmark's creation-time ORB angle drifts across
                # views); the reference likewise reserves the
                # histogram for frame-to-frame matchers
                # (Matcher.cpp:294-336 is used by SearchByBoW /
                # SearchForTriangulation, not FindDirectProjection).
                tm = orbtrack.track_map_orb(
                    cur_pyr[0].shape, cam, T_pred,
                    mstate.pt_pos, mstate.pt_valid, mstate.pt_desc,
                    feats,
                    radius_coarse=o.orb_match_radius,
                    max_dist=o.orb_max_hamming,
                    max_step_motion=o.max_step_motion,
                )
                mstate = mstate._replace(
                    pt_visible=mstate.pt_visible
                    + tm.candidate.astype(jnp.int32),
                    pt_found=mstate.pt_found + tm.found.astype(jnp.int32),
                )
                return tm, mstate

            @jax.jit
            def _track_orb_wide(cur_pyr, T_pred7, mstate):
                """Second-chance SPARSE_ORB pass: when the
                motion-model window misses (fast motion, shutter
                jump), re-search with a much wider window, relaxed
                Hamming bound and a doubled step gate — the role
                SearchByBoW's window-free frame matching plays in
                ORB-SLAM's TrackReferenceKeyFrame fallback.  Map-point
                counters are NOT advanced here (a failed wide pass
                should not depress found-ratios)."""
                T_pred = SE3.from_params7(T_pred7)
                feats = fe.detect_multilevel(
                    cur_pyr, o.detect_threshold, o.grid_cell,
                    o.feat_budgets,
                )
                return orbtrack.track_map_orb(
                    cur_pyr[0].shape, cam, T_pred,
                    mstate.pt_pos, mstate.pt_valid, mstate.pt_desc,
                    feats,
                    radius_coarse=o.orb_match_radius
                    * o.orb_wide_radius_mult,
                    radius_fine=6.0 * o.orb_wide_radius_mult,
                    max_dist=min(o.orb_max_hamming + 20, 128),
                    max_step_motion=2.0 * o.max_step_motion,
                )

            self._jit_track_orb = _track_orb
            self._jit_track_orb_wide = _track_orb_wide

        if (o.vo_type is VOType.SEMI_DENSE_DIRECT
                or o.map_type is not MapType.SPARSE):
            from . import semidense as sdm

            @jax.jit
            def _track_sd(sd, kf_img, cur_pyr, T_pred7, mstate,
                          kf_images):
                """SEMI_DENSE_DIRECT frame tracking: direct alignment
                against the last keyframe over [its features + its
                gradient pixels], then map patch tracking + pose BA,
                then a seed update at the refined pose — one fused
                step."""
                slot = sd.kf_slot
                T_kf = SE3.from_params7(mstate.kf_pose7[slot])
                T_pred = SE3.from_params7(T_pred7)
                kf_pyr = fe.preprocess(kf_img, o.n_levels)
                px, depth, pmask = sdm.alignment_point_set(
                    sd, mstate.feat_px[slot], mstate.feat_depth[slot],
                    mstate.feat_valid[slot],
                )
                tr = fe.track_ref_frame(
                    kf_pyr, cur_pyr, cam, T_kf, px, depth, pmask,
                    T_pred, max_motion=o.max_alignment_motion,
                )
                patches, patch_ok, search_lvl = (
                    fe.reference_patches_for_landmarks(
                        kf_images, mstate.kf_pose7,
                        mstate.feat_px.reshape(-1, 2),
                        mstate.feat_level.reshape(-1),
                        mstate.pt_ref_feat, mstate.pt_pos,
                        mstate.pt_valid, cam, tr.T_cw,
                        max_level=o.n_levels - 1,
                    )
                )
                tm = fe.track_local_map(
                    cur_pyr, cam, tr.T_cw, mstate.pt_pos,
                    mstate.pt_valid, patches, patch_ok, search_lvl,
                    max_step_motion=o.max_step_motion,
                )
                mstate = mstate._replace(
                    pt_visible=mstate.pt_visible
                    + tm.candidate.astype(jnp.int32),
                    pt_found=mstate.pt_found + tm.found.astype(jnp.int32),
                )
                T_cur_kf = tm.T_cw.compose(T_kf.inverse())
                sd = sdm.update(sd, kf_img, cur_pyr[0], cam, T_cur_kf)
                return tm, mstate, tr.ok, sd

            @jax.jit
            def _sd_init(img, slot, depth_mean):
                px, valid = sdm.select_gradient_pixels(
                    img, cell=o.sd_cell, budget=o.sd_budget,
                    min_grad=o.sd_min_grad,
                )
                seeds = dfilt.Seeds.init(
                    px, valid, depth_mean=1.0, depth_min=0.1
                )
                # Rescale the unit-depth seed prior to the scene's
                # mean depth (Seeds.init wants static floats; the
                # mean depth is a traced scalar here).
                seeds = seeds._replace(
                    mu=seeds.mu / depth_mean,
                    z_range=seeds.z_range / jnp.maximum(
                        depth_mean, 1e-3
                    ),
                    sigma2=seeds.sigma2 / jnp.maximum(
                        depth_mean, 1e-3
                    ) ** 2,
                )
                return sdm.SemiDensePoints(
                    px=px, seeds=seeds,
                    kf_slot=jnp.asarray(slot, jnp.int32),
                )

            @jax.jit
            def _sd_export(sd, mstate):
                T_kf = SE3.from_params7(mstate.kf_pose7[sd.kf_slot])
                return sdm.export_points(sd, T_kf, cam)

            self._jit_track_sd = _track_sd
            self._jit_sd_init = _sd_init
            self._jit_sd_export = _sd_export

        @jax.jit
        def _triangulate(mstate, feats_px, feats_desc, feats_valid,
                         feats_angle, T_new7, nbr_slot):
            T_new = SE3.from_params7(T_new7)
            T_ref = SE3.from_params7(mstate.kf_pose7[nbr_slot])
            desc_ref = mstate.feat_desc[nbr_slot]
            px_ref = mstate.feat_px[nbr_slot]
            # Only unlinked neighbor features take part (linked ones
            # already have landmarks).
            ref_free = (
                mstate.feat_valid[nbr_slot]
                & (mstate.feat_point[nbr_slot] < 0)
            )
            return lm.match_new_features_for_triangulation(
                cam, feats_desc, feats_px, feats_valid, T_new,
                desc_ref, px_ref, ref_free, T_ref,
                angle_new=feats_angle,
                angle_ref=mstate.feat_angle[nbr_slot],
            )

        @jax.jit
        def _update_seeds(seeds, ref_img, cur_img, T_cur_ref7):
            return dfilt.update_seeds_from_frame(
                seeds, ref_img, cur_img, cam,
                SE3.from_params7(T_cur_ref7),
            )

        @jax.jit
        def _fuse_neighbors(mstate, slot):
            return lm.search_in_neighbors(mstate, cam, slot)

        @jax.jit
        def _mapping(mstate, fixed_slots):
            mstate = ms.update_covisibility(mstate)
            mstate, chi2 = lm.local_ba_on_map(
                mstate, cam, fixed_slots, n_iter=o.local_ba_iters
            )
            mstate = lm.map_point_culling(mstate)
            mstate = ms.update_covisibility(mstate)
            return mstate, chi2

        def _kf_redundancy_device(m, min_obs: int = 4, maxlvl: int = 8):
            """[K] scale-aware keyframe-redundancy scores — device
            mirror of native ms_kf_redundancy_scale (one scatter-add +
            level prefix instead of a host fetch of three [K,F]
            arrays per mapping pass)."""
            K, F = m.feat_valid.shape
            L = m.pt_pos.shape[0]
            p = m.feat_point.reshape(-1)
            okf = m.feat_valid.reshape(-1) & (p >= 0) & (p < L)
            psafe = jnp.clip(p, 0, L - 1)
            lvl = jnp.clip(m.feat_level.reshape(-1), 0, maxlvl - 1)
            counts = jnp.zeros((L, maxlvl), jnp.int32).at[
                psafe, lvl
            ].add(okf.astype(jnp.int32))
            cum = jnp.cumsum(counts, axis=1)
            l1 = jnp.clip(m.feat_level.reshape(-1) + 1, 0, maxlvl - 1)
            red = okf & (cum[psafe, l1] >= min_obs)
            linked = okf.reshape(K, F).sum(1)
            redundant = red.reshape(K, F).sum(1)
            return jnp.where(
                linked > 0,
                redundant.astype(jnp.float32)
                / jnp.maximum(linked, 1).astype(jnp.float32),
                0.0,
            )

        @jax.jit
        def _map_pass(mstate, slot, kf_bow, kf_nodes, fixed,
                      enable_loop):
            """The ENTIRE keyframe mapping pass as ONE device program
            (round-5, VERDICT #1b): covisibility/orphan refresh,
            active-window loop detection + closure, local BA, map-
            point culling and keyframe-redundancy scoring.  The
            round-4 pass dispatched refresh + loop + refresh + BA +
            a 3-array cull fetch (~5 round trips x ~26 ms over the
            serving tunnel) per keyframe.  Archive (long-range) loop
            detection keeps its own dispatch — it runs conditionally
            at the host's cooldown/significance discipline."""
            mstate = ms.update_covisibility(mstate)
            orphaned = mstate.pt_valid & (mstate.pt_obs == 0)
            mstate = mstate._replace(
                pt_valid=mstate.pt_valid & (~orphaned)
            )
            if have_vocab:
                lp = reloc.detect_loop(
                    vocab, cam, slot, kf_bow, mstate.kf_valid,
                    mstate.kf_pose7, mstate.cov_weight,
                    mstate.feat_desc.reshape(-1, 8),
                    kf_nodes.reshape(-1),
                    mstate.feat_px.reshape(-1, 2),
                    mstate.feat_point.reshape(-1),
                    mstate.feat_valid.reshape(-1),
                    mstate.pt_pos, mstate.pt_valid,
                    min_inliers=o.loop_min_inliers,
                    feat_angle_flat=mstate.feat_angle.reshape(-1),
                )
                lp = lp._replace(found=lp.found & enable_loop)
                pose7, pts, _chi2 = reloc.close_loop(
                    mstate.kf_pose7, mstate.kf_valid,
                    mstate.cov_weight, mstate.pt_pos, mstate.pt_valid,
                    mstate.pt_first_kf, slot, lp,
                    feat_point=mstate.feat_point,
                    feat_valid=mstate.feat_valid,
                )
                mstate = mstate._replace(
                    kf_pose7=jnp.where(lp.found, pose7,
                                       mstate.kf_pose7),
                    pt_pos=jnp.where(lp.found, pts, mstate.pt_pos),
                )
            else:
                lp = jnp.zeros((), bool)  # placeholder "found" flag
            mstate, chi2 = _mapping(mstate, fixed)
            scores = _kf_redundancy_device(mstate)
            found = lp.found if have_vocab else lp
            return (mstate, found, scores, mstate.kf_pose7,
                    mstate.kf_id)

        self._jit_map_pass = _map_pass

        if self.vocab is not None:
            vocab = self.vocab

            @jax.jit
            def _kf_bow(desc, valid):
                words, nodes = voc.transform(vocab, desc, valid)
                return voc.bow_vector(vocab, words, valid), nodes

            @jax.jit
            def _reloc(q_desc, q_px, q_valid, q_angle, kf_bow,
                       kf_nodes, mstate):
                return reloc.relocalize(
                    vocab, cam, q_desc, q_px, q_valid,
                    kf_bow, mstate.kf_valid, mstate.kf_pose7,
                    mstate.feat_desc.reshape(-1, 8),
                    kf_nodes.reshape(-1),
                    mstate.feat_point.reshape(-1),
                    mstate.feat_valid.reshape(-1),
                    mstate.pt_pos, mstate.pt_valid,
                    min_inliers=o.reloc_min_inliers,
                    feat_angle_flat=mstate.feat_angle.reshape(-1),
                    q_angle=q_angle,
                    top_c=o.reloc_top_c,
                    use_pnp=o.reloc_use_pnp,
                )

            @jax.jit
            def _reloc_arc(q_desc, q_px, q_valid, q_angle, arc):
                return reloc.relocalize_archive(
                    vocab, cam, q_desc, q_px, q_valid, arc,
                    min_inliers=o.reloc_min_inliers, q_angle=q_angle,
                    top_c=o.reloc_top_c, use_pnp=o.reloc_use_pnp,
                )

            @jax.jit
            def _loop_arc(new_slot, new_fid, kf_bow, kf_nodes, mstate,
                          arc):
                return reloc.detect_loop_archive(
                    vocab, cam, new_slot, new_fid,
                    kf_bow, mstate.kf_valid, mstate.cov_weight,
                    mstate.feat_desc.reshape(-1, 8),
                    kf_nodes.reshape(-1),
                    mstate.feat_px.reshape(-1, 2),
                    mstate.feat_valid.reshape(-1),
                    mstate.kf_pose7, arc,
                    min_frame_gap=o.loop_min_frame_gap,
                    min_inliers=o.loop_min_inliers,
                    feat_angle_flat=mstate.feat_angle.reshape(-1),
                    feat_point_flat=mstate.feat_point.reshape(-1),
                    pt_pos=mstate.pt_pos, pt_valid=mstate.pt_valid,
                    top_c=o.loop_top_c,
                )

            self._jit_reloc_arc = _reloc_arc
            self._jit_loop_arc = _loop_arc
            self._jit_kf_bow = _kf_bow
            self._jit_reloc = _reloc

        Fl = o.map_F // 2
        Fn = o.map_F - Fl
        have_vocab = self.vocab is not None

        @jax.jit
        def _kf_presweep(mstate, found):
            """Post-eviction covisibility refresh + orphan sweep in ONE
            dispatch (sparing currently-tracked landmarks — see
            _insert_keyframe)."""
            mstate = ms.update_covisibility(mstate)
            orphaned = mstate.pt_valid & (mstate.pt_obs == 0) & (~found)
            return mstate._replace(
                pt_valid=mstate.pt_valid & (~orphaned)
            )

        def _assemble_core(mstate, pyr, found, obs_px, T_cw7,
                           last_kf_slot, rows, n_free, slot, fid,
                           kf_images, nbr2_slot=None):
            """The ENTIRE synchronous keyframe-assembly pass as ONE
            device program: feature-table construction, detection,
            triangulation vs the last keyframe, re-description,
            registration, landmark creation, descriptor refresh,
            SearchInNeighbors fusion and the BoW transform.  The
            per-op eager version cost ~40 host round trips — ~26 ms
            EACH over the serving tunnel (measured ~6.5 s/keyframe on
            the public-API bench); this is the keyframe-rate analogue
            of the chunked tracking scan.  Round 5 folds it into the
            wider _kf_cycle program (slot allocation, eviction,
            archive snapshot, presweep, seed promotion and re-seeding
            all in the SAME dispatch)."""
            T_cw = SE3.from_params7(T_cw7)
            found_i = found.astype(jnp.int32)
            _, top_rows = jax.lax.top_k(
                found_i * (1 + mstate.pt_obs), Fl
            )
            lm_rows = top_rows.astype(jnp.int32)
            lm_ok = found[lm_rows]
            lm_px = obs_px[lm_rows]
            z = T_cw.apply(mstate.pt_pos[lm_rows])[:, 2]
            feats = _detect(pyr, lm_px, lm_ok)
            new_px = feats.px[:Fn]
            new_valid = feats.valid[:Fn]
            new_desc = feats.desc[:Fn]
            new_level = feats.level[:Fn]
            new_angle = feats.angle[:Fn]
            pos_w, good, _ = _triangulate(
                mstate, new_px, new_desc, new_valid, new_angle,
                T_cw7, last_kf_slot,
            )
            if nbr2_slot is not None:
                # Second, LONGER-baseline neighbor (round-5): at this
                # keyframe cadence the one-keyframe baseline gives
                # only ~1.3 deg of parallax at the benchmark's median
                # depth — under the 0.9998-cos parallax gate, views of
                # the room's FAR half triangulated exactly zero new
                # landmarks per keyframe for ~10 straight keyframes
                # (measured; the tracking death spiral at frame ~590).
                # A ~4-keyframes-back neighbor quadruples the baseline
                # and restores the yield; where both pass, the longer
                # baseline wins (better-conditioned depth).
                pos_w2, good2, _ = _triangulate(
                    mstate, new_px, new_desc, new_valid, new_angle,
                    T_cw7, nbr2_slot,
                )
                pos_w = jnp.where(good2[:, None], pos_w2, pos_w)
                good = good | good2
            can_write = good & (jnp.arange(Fn) < n_free)
            feat_px = jnp.concatenate([lm_px, new_px])
            feat_level = jnp.concatenate(
                [jnp.zeros(Fl, jnp.int32), new_level]
            )
            lm_angle, lm_desc = _describe_at(pyr[0], lm_px)
            feat_angle = jnp.concatenate([lm_angle, new_angle])
            feat_desc = jnp.concatenate([lm_desc, new_desc])
            z_new = T_cw.apply(pos_w)[:, 2]
            feat_depth = jnp.concatenate(
                [jnp.where(lm_ok, z, -1.0),
                 jnp.where(can_write, z_new, -1.0)]
            )
            feat_point = jnp.concatenate(
                [jnp.where(lm_ok, lm_rows, -1),
                 jnp.where(can_write, rows, -1)]
            )
            feat_valid = jnp.concatenate([lm_ok, new_valid])
            st = ms.insert_keyframe(
                mstate, slot, fid, T_cw, feat_px, feat_level,
                feat_angle, feat_desc, feat_depth, feat_point,
                feat_valid,
            )
            pd = st.pt_desc.at[lm_rows].set(
                jnp.where(lm_ok[:, None], lm_desc, st.pt_desc[lm_rows])
            )
            st = st._replace(pt_desc=pd)
            st = ms.add_landmarks(
                st, rows, can_write, pos_w, new_desc, slot,
                ref_feat=slot * o.map_F + Fl
                + jnp.arange(Fn, dtype=jnp.int32),
            )
            kf_images = kf_images.at[slot].set(pyr[0])
            st = lm.search_in_neighbors(st, cam, slot)
            if have_vocab:
                bow_row, nodes_row = _kf_bow(feat_desc, feat_valid)
            else:
                bow_row = jnp.zeros((1,), jnp.float32)
                nodes_row = jnp.full((o.map_F,), -1, jnp.int32)
            # Depth-filter seeding decisions (scalars pulled in the
            # same round trip as the rest of the outputs).
            fp_now = st.feat_point[slot][Fl + jnp.arange(Fn)]
            depthless = new_valid & (~can_write) & (fp_now < 0)
            z_map = jnp.where(
                mstate.pt_valid,
                SE3.from_params7(
                    mstate.kf_pose7[last_kf_slot]
                ).apply(mstate.pt_pos)[:, 2],
                0.0,
            )
            mean_d = z_map.sum() / jnp.maximum(
                mstate.pt_valid.sum(), 1
            ).astype(z_map.dtype)
            return (st, kf_images, bow_row, nodes_row, new_px,
                    depthless, mean_d)

        def _free_rows_device(pt_valid, want: int):
            """First `want` free landmark rows ascending + count found
            (device mirror of native ms_free_rows — removes the
            pt_valid device->host fetch from the keyframe cycle)."""
            L = pt_valid.shape[0]
            free = ~pt_valid
            key = jnp.where(free, L - jnp.arange(L, dtype=jnp.int32), 0)
            _, rows = jax.lax.top_k(key, want)
            n_free = jnp.minimum(free.sum(), want).astype(jnp.int32)
            rows = jnp.where(
                jnp.arange(want) < n_free, rows.astype(jnp.int32), L - 1
            )
            return rows, n_free

        @jax.jit
        def _kf_cycle(mstate, pyr, found, obs_px, T_cw7, last_kf_slot,
                      nbr2_slot, fid, kf_images, kf_bow, kf_nodes,
                      seeds, seed_slot, seed_feat_idx):
            """ONE device program for the whole synchronous (frame-
            return-path) half of keyframe insertion: slot allocation +
            eviction choice (device mirror of native ms_alloc_kf_slot),
            archive snapshot of the victim, slot invalidation, pre-
            eviction covisibility/orphan sweep, landmark-row
            allocation, the full assembly pass (_assemble_core),
            BoW-table row writes, depth-filter seed promotion and
            re-seeding.  The round-4 path dispatched ~7 programs plus
            ~4 host fetches per keyframe; this is 1 dispatch + 1
            batched fetch (VERDICT r4 #1b).  The mapping pass (loop
            closing + local BA + culling) stays on the async worker."""
            K, Fcap = o.map_K, o.map_F
            # --- slot allocation (ms_alloc_kf_slot mirror) ---
            used = mstate.kf_valid
            any_free = jnp.any(~used)
            first_free = jnp.argmin(used.astype(jnp.int32)).astype(
                jnp.int32
            )
            newest = last_kf_slot
            imax = jnp.iinfo(jnp.int32).max
            w = jnp.where(
                used & (jnp.arange(K) != newest),
                mstate.cov_weight[newest], imax,
            )
            victim = jnp.argmin(w).astype(jnp.int32)
            evicted = ~any_free
            slot = jnp.where(evicted, victim, first_free)
            evict_fid = mstate.kf_id[slot]
            # --- archive snapshot (pre-invalidate; garbage rows when
            # nothing is evicted — the host checks `evicted`) ---
            fp = mstate.feat_point[slot]
            ptsafe = jnp.clip(fp, 0, mstate.pt_pos.shape[0] - 1)
            snap_ok = (mstate.feat_valid[slot] & (fp >= 0)
                       & mstate.pt_valid[ptsafe])
            snapshot = (
                mstate.kf_pose7[slot], mstate.feat_desc[slot],
                mstate.feat_px[slot], mstate.feat_valid[slot],
                mstate.pt_pos[ptsafe], snap_ok,
                mstate.feat_angle[slot], mstate.feat_level[slot],
                kf_images[slot],
                kf_bow[slot] if kf_bow is not None
                else jnp.zeros((1,), jnp.float32),
                kf_nodes[slot] if kf_nodes is not None
                else jnp.full((Fcap,), -1, jnp.int32),
            )
            # --- invalidate the victim + presweep (_kf_presweep) ---
            m2 = mstate._replace(
                kf_valid=mstate.kf_valid.at[slot].set(
                    mstate.kf_valid[slot] & ~evicted
                ),
                feat_valid=mstate.feat_valid.at[slot].set(
                    mstate.feat_valid[slot] & ~evicted
                ),
                feat_point=mstate.feat_point.at[slot].set(
                    jnp.where(evicted, -1, mstate.feat_point[slot])
                ),
            )
            # Presweep ONLY on eviction (exactly the round-4 host
            # logic: the covisibility refresh + orphan sweep ran
            # behind alloc_kf_slot's evict branch; running it
            # unconditionally changes pt_obs and the top-k feature
            # selection for non-evicting keyframes).
            ms_ref = ms.update_covisibility(m2)
            orphaned = ms_ref.pt_valid & (ms_ref.pt_obs == 0) & (~found)
            ms_ref = ms_ref._replace(
                pt_valid=ms_ref.pt_valid & (~orphaned)
            )
            m2 = jax.tree.map(
                lambda a, b: jnp.where(evicted, a, b), ms_ref, m2
            )
            # --- landmark rows + assembly ---
            rows, n_free = _free_rows_device(m2.pt_valid, Fn)
            (st, kf_images, bow_row, nodes_row, new_px, depthless,
             mean_d) = _assemble_core(
                m2, pyr, found, obs_px, T_cw7, last_kf_slot, rows,
                n_free, slot, fid, kf_images, nbr2_slot=nbr2_slot,
            )
            if kf_bow is not None:
                kf_bow = kf_bow.at[slot].set(bow_row)
                kf_nodes = kf_nodes.at[slot].set(nodes_row)
            # --- depth-filter: promote the previous keyframe's
            # converged seeds (_promote_seeds), then re-seed ---
            if seeds is not None:
                conv = seeds.converged(ratio=100.0) & seeds.valid
                n_s = conv.shape[0]
                rows2, n_free2 = _free_rows_device(st.pt_valid, n_s)
                sf_idx = seed_feat_idx
                still_free = st.feat_point[seed_slot][sf_idx] < 0
                can = conv & still_free & (jnp.arange(n_s) < n_free2)
                T_kf = st.kf_pose(seed_slot)
                pos_w = cam.pixel_to_world(
                    seeds.px, T_kf, depth=seeds.depth()
                )
                desc_s = st.feat_desc[seed_slot][sf_idx]
                st = ms.add_landmarks(
                    st, rows2, can, pos_w, desc_s, seed_slot,
                    ref_feat=seed_slot * Fcap + sf_idx,
                )
                fp2 = st.feat_point[seed_slot].at[sf_idx].set(
                    jnp.where(can, rows2,
                              st.feat_point[seed_slot][sf_idx])
                )
                fd2 = st.feat_depth[seed_slot].at[sf_idx].set(
                    jnp.where(can, seeds.depth(),
                              st.feat_depth[seed_slot][sf_idx])
                )
                st = st._replace(
                    feat_point=st.feat_point.at[seed_slot].set(fp2),
                    feat_depth=st.feat_depth.at[seed_slot].set(fd2),
                )
            mean_safe = jnp.maximum(
                jnp.where(mean_d > 0, mean_d, 1.0), 0.5
            )
            new_seeds = dfilt.Seeds.init(
                new_px, depthless, depth_mean=1.0, depth_min=0.1
            )
            new_seeds = new_seeds._replace(mu=new_seeds.mu / mean_safe)
            d_any = jnp.any(depthless)
            host_block = (slot, evicted, evict_fid, d_any) + snapshot
            return st, kf_images, kf_bow, kf_nodes, new_seeds, host_block

        self._jit_kf_presweep = _kf_presweep
        self._jit_kf_cycle = _kf_cycle

        @jax.jit
        def _arc_snapshot(mstate, slot):
            """One-dispatch gather of an evicted keyframe's archive
            record (pose, features, and per-feature landmark world
            positions)."""
            fp = mstate.feat_point[slot]
            ptsafe = jnp.clip(fp, 0, mstate.pt_pos.shape[0] - 1)
            ok = (
                mstate.feat_valid[slot]
                & (fp >= 0)
                & mstate.pt_valid[ptsafe]
            )
            return (
                mstate.kf_pose7[slot], mstate.feat_desc[slot],
                mstate.feat_px[slot], mstate.feat_valid[slot],
                mstate.pt_pos[ptsafe], ok, mstate.feat_angle[slot],
                mstate.feat_level[slot],
            )

        self._jit_arc_snapshot = _arc_snapshot
        self._jit_apply_corr = jax.jit(reloc.apply_global_correction)
        self._jit_apply_corr_sim3 = jax.jit(
            lambda m, p7, sc: reloc.apply_global_correction(m, p7, sc)
        )

        self._jit_detect = _detect
        self._jit_desc_check = _desc_check
        self._jit_describe_at = _describe_at
        self._jit_detect_free = _detect_free
        self._jit_klt = _klt
        self._jit_init = _init
        self._jit_two_view_ba = _two_view_ba
        self._jit_track = jax.jit(_track)
        self._jit_triangulate = _triangulate
        self._jit_mapping = _mapping
        self._jit_fuse_neighbors = _fuse_neighbors
        self._jit_update_seeds = _update_seeds

    # ------------------------------------------------------------------
    def add_frame(self, img, timestamp: float = 0.0, depth=None,
                  right=None) -> TrackResult:
        """Main entry (VisualOdometry::AddFrame dispatch, :38-107).

        With a `depth` image (RGBD) or a rectified `right` image
        (STEREO), initialization is direct: the first frame becomes a
        keyframe with depth-initialized landmarks (no monocular
        bootstrap), and keyframe insertion measures new-feature depths
        from the sensor."""
        self._join_mapping()
        self.frame_id += 1
        if self.status is not Status.GOOD:
            self._low_streak = 0   # hysteresis counts GOOD frames only
        pyr = fe.preprocess(jnp.asarray(img), self.o.n_levels)
        self.cur_depth = None if depth is None else jnp.asarray(depth)
        self.cur_right = (
            None if right is None else jnp.asarray(right, jnp.float32)
        )
        if self.kf_images is None:
            H, W = pyr[0].shape
            self.kf_images = jnp.zeros((self.o.map_K, H, W), jnp.float32)

        if self.status == Status.NOT_READY:
            if self.server.kf_used and self.vocab is not None:
                # A loaded (or surviving) map exists: resume by
                # relocalizing against it instead of re-initializing.
                r = self._try_relocalize(pyr)
                if r is not None:
                    self.status = Status.GOOD
                    self.prev_pyr = pyr
                    self.prev_T_cw = r.T_cw
                    self.T_cw = r.T_cw
                    L = self.o.map_L
                    if self._last_reloc_arc_idx is not None:
                        found, obs_px = self._reactivate_archived(
                            self._last_reloc_arc_idx, r.T_cw
                        )
                        self.prev_found = found
                        self.prev_obs_px = obs_px
                    else:
                        self.prev_found = jnp.zeros(L, bool)
                        self.prev_obs_px = jnp.zeros((L, 2), jnp.float32)
                        self.last_kf_slot = self.server.kf_used[-1]
                        self.frames_since_kf = 0
                        self._last_kf_fid = int(
                            self.server.state.kf_id[self.last_kf_slot]
                        )
                        self._last_kf_pose7 = np.asarray(
                            self.server.state.kf_pose7[self.last_kf_slot]
                        )
                    self.velocity = SE3.identity()
                    res = TrackResult(Status.GOOD, r.T_cw,
                                      int(r.n_inliers))
                elif depth is not None or right is not None:
                    res = self._init_rgbd(pyr)
                else:
                    res = self._start_init(pyr)
            elif depth is not None or right is not None:
                res = self._init_rgbd(pyr)
            else:
                res = self._start_init(pyr)
        elif self.status == Status.INITING:
            res = self._try_init(pyr)
        elif self.status == Status.GOOD:
            res = self._track_frame(pyr)
        else:  # LOST
            res = self._handle_lost(pyr)
        self.stats["frames"] += 1
        if res.status is Status.GOOD:
            self.stats["frames_good"] += 1
            self.stats["inliers_total"] += res.n_inliers
        elif res.status is Status.LOST:
            self.stats["frames_lost"] += 1
        if log.isEnabledFor(logging.DEBUG):
            # The reference glogs per-frame tracking counters
            # (SURVEY §5); opt in with
            # logging.getLogger("ygz_slam_tpu.vo").setLevel(DEBUG).
            log.debug(
                "frame %d: %s inliers=%d kfs=%d archive=%d",
                self.frame_id, res.status.name, res.n_inliers,
                len(self.server.kf_used),
                self.archive.count if self.archive else 0,
            )
        if res.T_cw is not None:
            abs7 = np.asarray(res.T_cw.params7())
            self.trajectory.append((timestamp, abs7))
            if res.status is Status.GOOD and self._last_kf_fid >= 0:
                rel7 = np_se3.relative7(
                    abs7, self._last_kf_pose7
                ).astype(np.float32)
                self.traj_rel.append(
                    (timestamp, self._last_kf_fid, rel7)
                )
            else:
                self.traj_rel.append((timestamp, -1, abs7))
        return res

    def add_frames(self, imgs, timestamps=None,
                   chunk: int | None = None) -> list:
        """Chunked tracking: spans of ordinary frames run as ONE
        on-device lax.scan dispatch (the per-frame API pays a fixed
        ~26 ms dispatch cost per frame over a serving tunnel; this
        pays it per chunk — the bench-measured throughput carried into
        the product surface).

        Semantics match repeated add_frame exactly: the in-scan gates
        flag the first frame that goes lost or needs a keyframe, the
        chunk is truncated BEFORE it, and that frame replays through
        the per-frame path (initialization, keyframe insertion,
        relocalization and non-default VO modes always take the
        per-frame path).  Returns a TrackResult per frame."""
        n = len(imgs)
        ts = (list(timestamps) if timestamps is not None
              else [0.0] * n)
        chunk = chunk or self.o.chunk_frames
        eligible = (self.o.vo_type is VOType.SPARSE_DIRECT
                    and self.o.map_type is MapType.SPARSE)
        results: list[TrackResult] = []
        i = 0
        while i < n:
            self._join_mapping()
            # Per-frame path whenever chunking can't apply (also keeps
            # compilation to ONE chunk length: short tails go
            # per-frame rather than compiling per remainder length).
            if (not eligible or self.status is not Status.GOOD
                    or n - i < chunk
                    # A confirmed marginal streak rides on per-frame
                    # descriptor verification, which the in-scan gate
                    # cannot run — dispatching a chunk here would
                    # deterministically truncate at j=0.
                    or self._low_streak >= self.o.track_confirm_frames):
                results.append(self.add_frame(imgs[i], ts[i]))
                i += 1
                continue
            sl = jnp.asarray(imgs[i:i + chunk], jnp.float32)
            st = self.server.state
            with_seeds = (self.seeds is not None
                          and self.o.use_depth_filter)
            carry, ys = self._jit_track_chunk(
                sl, self.prev_pyr, self.prev_T_cw.params7(),
                self.velocity.params7(), st, self.kf_images,
                self.prev_found, self.prev_obs_px,
                jnp.asarray(self.frames_since_kf, jnp.int32),
                st.kf_pose7[self.last_kf_slot],
                jnp.asarray(self._low_streak, jnp.int32),
                self.seeds if with_seeds else None,
                self.kf_images[self.seed_kf_slot] if with_seeds else None,
                st.kf_pose7[self.seed_kf_slot] if with_seeds else None,
            )
            (T7y, vel7y, inly, kfy, losty, foundy, candy, obsy,
             streaky, seedsy) = ys
            flags = np.asarray(kfy | losty)
            j = int(np.argmax(flags)) if flags.any() else chunk
            if j == 0:
                results.append(self.add_frame(imgs[i], ts[i]))
                i += 1
                continue
            if j == chunk:
                (self.prev_pyr, prev_T7, vel7, mstate, self.prev_found,
                 self.prev_obs_px, _fsk, streak_f, seeds_f) = carry
                self._low_streak = int(streak_f)
            else:
                mstate = self._jit_accept_counters(st, candy, foundy, j)
                self.prev_found = foundy[j - 1]
                self.prev_obs_px = obsy[j - 1]
                self.prev_pyr = fe.preprocess(sl[j - 1], self.o.n_levels)
                prev_T7 = T7y[j - 1]
                vel7 = vel7y[j - 1]
                self._low_streak = int(streaky[j - 1])
                seeds_f = (jax.tree.map(lambda a: a[j - 1], seedsy)
                           if with_seeds else None)
            self.server.state = mstate
            self.prev_T_cw = SE3.from_params7(prev_T7)
            self.T_cw = self.prev_T_cw
            self.velocity = SE3.from_params7(vel7)
            self.frames_since_kf += j
            self.frame_id += j
            if with_seeds:
                self.seeds = seeds_f
            T7_np = np.asarray(T7y[:j])
            inl_np = np.asarray(inly[:j])
            rel7s = (
                np_se3.relative7(
                    T7_np, self._last_kf_pose7[None]
                ).astype(np.float32)
                if self._last_kf_fid >= 0 else None
            )
            for k in range(j):
                self.trajectory.append((ts[i + k], T7_np[k].copy()))
                self.traj_rel.append(
                    (ts[i + k], self._last_kf_fid, rel7s[k])
                    if rel7s is not None
                    else (ts[i + k], -1, T7_np[k].copy())
                )
                results.append(TrackResult(
                    Status.GOOD, _se3_from_params7_np(T7_np[k]),
                    int(inl_np[k])))
            i += j
            if j < chunk and i < n:
                # The flagged frame is KNOWN to need the per-frame path
                # (keyframe insertion or lost handling); dispatching
                # another chunk here would deterministically yield j=0
                # and discard a whole chunk of device work.
                results.append(self.add_frame(imgs[i], ts[i]))
                i += 1
        return results

    # -- NOT_READY ------------------------------------------------------
    def _start_init(self, pyr):
        feats = self._jit_detect_free(pyr)
        if int(feats.valid.sum()) < self.o.init_min_features:
            return TrackResult(Status.NOT_READY, SE3.identity())
        self.init_pyr = pyr
        self.init_feats = feats
        self.init_track_px = feats.px
        # Frame id of the init REFERENCE frame: keyframe 0 of this map
        # must be registered under it (hard-coding 0 collides with the
        # previous epoch's fid 0 after a reset — pose-log/archive
        # entries would alias across world frames).
        self._init_ref_fid = self.frame_id
        self.status = Status.INITING
        return TrackResult(Status.INITING, SE3.identity())

    def _sensor_depths(self, pyr, px, valid):
        """Per-feature depths from the active depth sensor: RGBD depth
        image lookup, or rectified stereo matching (ops.stereo — the
        capability the reference's STEREO mode only declared)."""
        H, W = pyr[0].shape
        if self.cur_depth is not None:
            ui = jnp.clip(px[:, 0].astype(jnp.int32), 0, W - 1)
            vi = jnp.clip(px[:, 1].astype(jnp.int32), 0, H - 1)
            z = self.cur_depth[vi, ui]
            return z, valid & (z > 0.05) & jnp.isfinite(z)
        if self.cur_right is not None:
            from ..ops.stereo import match_stereo

            sd = match_stereo(
                pyr[0], self.cur_right, px, valid,
                self.cam.fx, self.stereo_baseline,
            )
            return sd.depth, sd.ok
        return jnp.full(px.shape[0], -1.0), jnp.zeros_like(valid)

    def _init_rgbd(self, pyr):
        """Depth-sensor bootstrap (RGBD or stereo): depth-initialized
        landmarks from frame 0 (the capability the legacy System
        promised via TrackRGBD/TrackStereo, system.h:49-57, never
        implemented there)."""
        o, srv = self.o, self.server
        feats = self._jit_detect_free(pyr)
        z, ok = self._sensor_depths(pyr, feats.px, feats.valid)
        if int(ok.sum()) < o.init_min_features // 2:
            return TrackResult(Status.NOT_READY, SE3.identity())
        T1 = SE3.identity()
        pts = self.cam.pixel_to_world(feats.px, T1, depth=z)
        N = feats.px.shape[0]
        rows = jnp.arange(N, dtype=jnp.int32)
        Fcap = o.map_F
        pad = Fcap - N
        def padded(x, fill=0):
            return jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
            )
        slot0 = srv.register_keyframe(
            self.frame_id, T1,
            padded(feats.px), padded(feats.level), padded(feats.angle),
            padded(feats.desc), padded(jnp.where(ok, z, -1.0), -1.0),
            padded(jnp.where(ok, rows, -1), -1),
            padded(ok, False),
        )
        srv.state = ms.add_landmarks(
            srv.state, rows, ok, pts, feats.desc, slot0,
            ref_feat=slot0 * Fcap + rows,
        )
        self.kf_images = self.kf_images.at[slot0].set(pyr[0])
        self._store_bow(slot0, padded(feats.desc), padded(ok, False))
        srv.refresh_covisibility()
        L = o.map_L
        self.prev_pyr = pyr
        self.prev_T_cw = T1
        self.T_cw = T1
        self.prev_found = jnp.zeros(L, bool).at[rows].set(ok)
        self.prev_obs_px = jnp.zeros((L, 2), jnp.float32).at[rows].set(feats.px)
        self.velocity = SE3.identity()
        self.last_kf_slot = slot0
        self._last_kf_fid = self.frame_id
        self._last_kf_pose7 = np.asarray(
            srv.state.kf_pose7[slot0], np.float32
        )
        self.frames_since_kf = 0
        self.status = Status.GOOD
        self._refresh_semidense(pyr, slot0)
        return TrackResult(Status.GOOD, T1, int(ok.sum()))

    # -- INITING --------------------------------------------------------
    def _try_init(self, pyr):
        o = self.o
        klt = self._jit_klt(
            self.init_pyr, pyr, self.init_feats.px, self.init_track_px
        )
        tracked = self.init_feats.valid & klt.converged
        if o.init_check_descriptors:
            d = self._jit_desc_check(
                self.init_feats.desc, pyr[0], klt.xy
            )
            cand = tracked & (d <= o.init_desc_max_dist)
            # Defensive: never let the re-check itself starve init.
            if int(cand.sum()) >= o.init_min_features:
                tracked = cand
        n_tracked = int(tracked.sum())
        if n_tracked < o.init_min_features:
            # Lost the reference — restart from this frame.
            self.status = Status.NOT_READY
            return self._start_init(pyr)
        self.init_track_px = klt.xy  # warm start for the next frame
        disp = jnp.linalg.norm(klt.xy - self.init_feats.px, axis=-1)
        mean_disp = float(jnp.where(tracked, disp, 0).sum() / n_tracked)
        if mean_disp < o.init_min_disparity:
            return TrackResult(Status.INITING, SE3.identity())
        out = self._jit_init(
            self.init_feats.px, klt.xy, tracked,
            jax.random.key(self.frame_id),
        )
        if not bool(out.success):
            return TrackResult(Status.INITING, SE3.identity())
        # Which RANSAC model bootstrapped the map (rh > 0.4 -> H,
        # else F/E; Initializer.cpp:65-80) — observable for tests and
        # run diagnostics.
        self.init_used_h = bool(out.used_h)
        self.stats["init_model_h" if self.init_used_h
                   else "init_model_f"] += 1
        # Two-view BA + rescale to mean depth 1 (:148-151, :261-275).
        res = self._jit_two_view_ba(
            SE3.identity(), out.T21, out.points3d,
            self.init_feats.px, klt.xy, out.good,
        )
        inl = res.inlier
        if int(inl.sum()) < o.init_min_inliers:
            return TrackResult(Status.INITING, SE3.identity())
        T2 = jax.tree.map(lambda a: a[1], res.poses)
        mean_depth = float(
            jnp.where(inl, res.points[:, 2], 0).sum()
            / jnp.maximum(inl.sum(), 1)
        )
        scale = 1.0 / max(mean_depth, 1e-6)
        pts = res.points * scale
        T2 = SE3(T2.R, T2.t * scale)
        self._create_initial_map(pyr, klt.xy, pts, inl, T2)
        self.status = Status.GOOD
        return TrackResult(Status.GOOD, T2, int(inl.sum()))

    def _create_initial_map(self, pyr, cur_px, pts, inl, T2):
        o, srv = self.o, self.server
        feats = self.init_feats
        Fcap = o.map_F
        N = feats.px.shape[0]
        # Landmark rows 0..N-1 (first allocation, map is empty).
        rows = jnp.arange(N, dtype=jnp.int32)
        T1 = SE3.identity()

        # Keyframe 0 (the init reference frame).
        pad = Fcap - N
        def padded(x, fill=0):
            return jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
            )
        z1 = T1.apply(pts)[:, 2]
        slot0 = srv.register_keyframe(
            self._init_ref_fid, T1,
            padded(feats.px), padded(feats.level), padded(feats.angle),
            padded(feats.desc), padded(jnp.where(inl, z1, -1.0), -1.0),
            padded(jnp.where(inl, rows, -1), -1),
            padded(inl, False),
        )
        # Landmark representative descriptors come from the CURRENT
        # frame (tracking continues from here; frame-0 descriptors are
        # already a disparity-widened viewpoint away).
        from ..ops import orb as orb_mod
        ang2, desc2 = orb_mod.compute(pyr[0], cur_px)
        srv.state = ms.add_landmarks(
            srv.state, rows, inl, pts, desc2,
            slot0, ref_feat=slot0 * Fcap + rows,
        )
        z2 = T2.apply(pts)[:, 2]
        slot1 = srv.register_keyframe(
            self.frame_id, T2,
            padded(cur_px), padded(feats.level), padded(ang2),
            padded(desc2), padded(jnp.where(inl, z2, -1.0), -1.0),
            padded(jnp.where(inl, rows, -1), -1),
            padded(inl, False),
        )
        self.kf_images = self.kf_images.at[slot0].set(self.init_pyr[0])
        self.kf_images = self.kf_images.at[slot1].set(pyr[0])
        self._store_bow(slot0, padded(feats.desc), padded(inl, False))
        self._store_bow(slot1, padded(desc2), padded(inl, False))
        srv.refresh_covisibility()
        # First local BA with both init keyframes fixed (gauge + scale).
        fixed = jnp.zeros(o.map_K, bool).at[slot0].set(True).at[slot1].set(True)
        srv.state, _ = self._jit_mapping(srv.state, fixed)
        # Frame bookkeeping.
        L = o.map_L
        found = jnp.zeros(L, bool).at[rows].set(inl)
        obs = jnp.zeros((L, 2), jnp.float32).at[rows].set(cur_px)
        self.prev_pyr = pyr
        self.prev_T_cw = T2
        self.T_cw = T2
        self.prev_found = found
        self.prev_obs_px = obs
        self.velocity = SE3.identity()
        self.last_kf_slot = slot1
        self._last_kf_fid = self.frame_id
        self._last_kf_pose7 = np.asarray(
            srv.state.kf_pose7[slot1], np.float32
        )
        self.frames_since_kf = 0
        self._refresh_semidense(pyr, slot1)

    # -- GOOD -----------------------------------------------------------
    def _run_tracker(self, pyr, T_pred):
        """Dispatch one frame through the configured VO type.  All
        three trackers share the TrackMapResult contract, so the state
        machine above is tracker-agnostic."""
        o = self.o
        if o.vo_type is VOType.SPARSE_ORB:
            tm, new_state = self._jit_track_orb(
                pyr, T_pred.params7(), self.server.state
            )
            return tm, new_state, True
        if o.vo_type is VOType.SEMI_DENSE_DIRECT and self.sd is not None:
            tm, new_state, ok, self.sd = self._jit_track_sd(
                self.sd, self.kf_images[int(self.sd.kf_slot)], pyr,
                T_pred.params7(), self.server.state, self.kf_images,
            )
            return tm, new_state, ok
        return self._jit_track(
            self.prev_pyr, pyr,
            self.prev_T_cw.params7(), T_pred.params7(),
            self.server.state, self.kf_images,
            self.prev_found, self.prev_obs_px,
        )

    def _track_frame(self, pyr):
        o = self.o
        T_pred = self.velocity.compose(self.prev_T_cw)
        fused_seeds = (o.vo_type is VOType.SPARSE_DIRECT
                       and self.seeds is not None
                       and o.use_depth_filter)
        new_seeds = None
        if fused_seeds:
            st = self.server.state
            tm, new_state, align_ok, new_seeds = (
                self._jit_track_with_seeds(
                    self.prev_pyr, pyr, self.prev_T_cw.params7(),
                    T_pred.params7(), st, self.kf_images,
                    self.prev_found, self.prev_obs_px, self.seeds,
                    jnp.asarray(self.seed_kf_slot, jnp.int32),
                )
            )
        else:
            tm, new_state, align_ok = self._run_tracker(pyr, T_pred)
        n_inl = int(tm.n_inliers)
        if (n_inl < o.min_track_inliers
                and o.vo_type is VOType.SPARSE_ORB
                and o.orb_second_chance):
            # Widened second-chance search seeded at the PREVIOUS pose
            # (motion model dropped — it is what just failed).
            tm2 = self._jit_track_orb_wide(
                pyr, self.prev_T_cw.params7(), self.server.state
            )
            n2 = int(tm2.n_inliers)
            if n2 >= o.min_track_inliers:
                self.stats["orb_second_chance_hits"] += 1
                tm, n_inl = tm2, n2
                new_state = self.server.state._replace(
                    pt_visible=self.server.state.pt_visible
                    + tm2.candidate.astype(jnp.int32),
                    pt_found=self.server.state.pt_found
                    + tm2.found.astype(jnp.int32),
                )
        marginal = n_inl < o.min_track_inliers
        if marginal:
            # Hysteresis (round-5): the gate's metric has a ±1-2 count
            # noise floor, so a SINGLE sub-gate frame is tracked
            # through (the pose is still the best available estimate).
            # A marginal STREAK gets the same descriptor re-
            # verification the lost-retry uses: low-texture wall
            # sections legitimately support only ~15±2 matches for
            # dozens of frames (measured on the 2000-frame benchmark),
            # and a photometric alignment whose matches agree with the
            # landmarks' ORB descriptors is not aliased — ride it out.
            # Only a drop below the hard floor, or a sub-gate streak
            # that FAILS descriptor verification, declares LOST.
            self._low_streak += 1
            hard = self._hard_inlier_floor()
            verified = False
            if (n_inl >= hard
                    and self._low_streak >= o.track_confirm_frames):
                d = self._jit_desc_check(
                    self.server.state.pt_desc, pyr[0], tm.obs_px
                )
                consistent = (np.asarray(tm.found)
                              & (np.asarray(d)
                                 <= self.o.lost_desc_max_dist))
                verified = int(consistent.sum()) >= hard
            if n_inl < hard or (
                self._low_streak >= o.track_confirm_frames
                and not verified
            ):
                self.status = Status.LOST
                self.lost_count = 0
                self._low_streak = 0
                return TrackResult(Status.LOST, self.T_cw, n_inl)
        else:
            self._low_streak = 0
        self.server.state = new_state
        T_cw = tm.T_cw
        # Depth-filter pass: refine seeds of the last keyframe's
        # depthless features against this frame (DepthFilter::
        # UpdateSeeds was meant to run per ordinary frame).  The
        # SPARSE_DIRECT path folded it into the tracking dispatch
        # (_jit_track_with_seeds); other VO types keep the separate
        # dispatch.
        if fused_seeds:
            self.seeds = new_seeds
        elif self.seeds is not None and self.o.use_depth_filter:
            T_kf = self.server.state.kf_pose(self.seed_kf_slot)
            T_cur_ref = T_cw.compose(T_kf.inverse())
            self.seeds = self._jit_update_seeds(
                self.seeds, self.kf_images[self.seed_kf_slot], pyr[0],
                T_cur_ref.params7(),
            )
        self.velocity = T_cw.compose(self.prev_T_cw.inverse())
        self.prev_pyr = pyr
        self.prev_T_cw = T_cw
        self.T_cw = T_cw
        self.prev_found = tm.found
        self.prev_obs_px = tm.obs_px
        self.frames_since_kf += 1
        # A frame tracked through on hysteresis must never become a
        # keyframe: its pose sits on the gate's noise floor, and a
        # keyframe inserted there bakes the error into the map
        # (measured round-5: marginal-pose keyframes turned transient
        # dips into resets).
        if not marginal and self._need_keyframe(T_cw):
            self._insert_keyframe(pyr, T_cw, tm)
        return TrackResult(Status.GOOD, T_cw, n_inl)

    def _hard_inlier_floor(self) -> int:
        """Immediate-LOST floor below which hysteresis does not apply
        (a genuinely failed alignment should not be tracked through)."""
        o = self.o
        return o.track_inlier_floor or max(1, o.min_track_inliers // 2)

    def _need_keyframe(self, T_cw) -> bool:
        """NeedNewKeyFrame (:304-321): >= min frames since the last KF
        AND motion beyond rotation/translation thresholds.

        Computed on HOST from the cached keyframe pose (np_se3.log6):
        the eager device version cost 6-8 per-frame dispatches on the
        per-frame path (round-5 dispatch audit)."""
        o = self.o
        if self.frames_since_kf < o.kf_min_frames:
            return False
        rel7 = np_se3.relative7(
            np.asarray(T_cw.params7()), self._last_kf_pose7
        )
        delta = np_se3.log6(rel7)
        trans = float(np.linalg.norm(delta[:3]))
        rot = float(np.linalg.norm(delta[3:]))
        return rot > o.kf_max_rot or trans > o.kf_max_trans

    def _insert_keyframe(self, pyr, T_cw, tm):
        """SetKeyframe (:182-218) + the synchronous mapping pass
        (LocalMapping::Run, LocalMapping.cpp:301-336)."""
        o, srv = self.o, self.server
        self.stats["keyframes"] += 1
        L, Fcap = o.map_L, o.map_F
        Fl = Fcap // 2
        Fn = Fcap - Fl
        sensor = (getattr(self, "cur_depth", None) is not None
                  or getattr(self, "cur_right", None) is not None)
        if not sensor:
            # Fast path (monocular): the ENTIRE synchronous half of
            # the keyframe cycle — slot allocation, eviction + archive
            # snapshot, presweep, assembly, BoW-row writes, seed
            # promotion and re-seeding — is ONE device program
            # (_jit_kf_cycle) followed by ONE batched host fetch.  The
            # round-4 path was ~7 dispatches + ~4 fetches/keyframe
            # (each ~26 ms over a serving tunnel).  The sensor path
            # below keeps the eager reference implementation
            # (depth/stereo sampling hooks between detection and
            # registration).
            with_seeds = (self.seeds is not None
                          and self.o.use_depth_filter)
            (srv.state, self.kf_images, kf_bow, kf_nodes, new_seeds,
             host_block) = self._jit_kf_cycle(
                srv.state, pyr, tm.found, tm.obs_px, T_cw.params7(),
                jnp.asarray(self.last_kf_slot, jnp.int32),
                jnp.asarray(
                    srv.kf_used[-4] if len(srv.kf_used) >= 4
                    else srv.kf_used[0], jnp.int32,
                ),
                self.frame_id, self.kf_images,
                self.kf_bow if self.vocab is not None else None,
                self.kf_nodes if self.vocab is not None else None,
                self.seeds if with_seeds else None,
                jnp.asarray(self.seed_kf_slot if with_seeds else 0,
                            jnp.int32),
                (self.seed_feat_idx if with_seeds
                 else jnp.zeros((Fn,), jnp.int32)),
            )
            if self.vocab is not None:
                self.kf_bow, self.kf_nodes = kf_bow, kf_nodes
            host = jax.device_get(host_block)
            (slot_a, evicted_a, evict_fid_a, d_any_a) = host[:4]
            slot = int(slot_a)
            if bool(evicted_a):
                efid = int(evict_fid_a)
                if efid >= 0 and self.archive is not None:
                    (pose7, desc, px, fvalid, pt_pos, pt_ok, angle,
                     level, img, bow, nodes) = host[4:]
                    self.archive.append(
                        efid, pose7, bow, nodes, desc, px, fvalid,
                        pt_pos, pt_ok, angle=angle, level=level,
                        image=np.clip(img, 0, 255).astype(np.uint8),
                        epoch=self.epoch,
                    )
                    self.kf_pose_log[efid] = pose7.copy()
                    self._fid_epoch.setdefault(efid, self.epoch)
                    self.stats["keyframes_archived"] += 1
                    if self.vocab is not None:
                        self._arc_compile_ahead()
                srv.kf_used.remove(slot)
            srv.kf_used.append(slot)
            self._refresh_semidense(pyr, slot)
            if self.o.use_depth_filter:
                self.seeds = new_seeds if bool(d_any_a) else None
                self.seed_kf_slot = slot
                self.seed_feat_idx = Fl + jnp.arange(
                    Fn, dtype=jnp.int32
                )
            self._finish_insert(pyr, T_cw, slot)
            return
        if len(srv.kf_used) >= o.map_K:
            # Registering this keyframe will evict a slot anyway; do
            # it NOW and sweep the evictee's orphaned landmark rows so
            # they are allocatable for THIS keyframe's triangulations.
            # Evicting after allocation returns freed rows one keyframe
            # late — on a panning trajectory that lag alone starved
            # triangulation for several keyframes (measured, round 4).
            # Landmarks the tracker is CURRENTLY observing are spared
            # even when the evictee was their last observer: the
            # feature table below re-links them to this keyframe
            # (culling them instead measurably drops tracking inliers
            # at every eviction).
            srv.alloc_kf_slot()
            srv.state = self._jit_kf_presweep(srv.state, tm.found)
        mstate = srv.state
        # --- feature table: half landmark observations, half new ---
        found_i = tm.found.astype(jnp.int32)
        _, top_rows = jax.lax.top_k(
            found_i * (1 + mstate.pt_obs), Fl
        )
        lm_rows = top_rows.astype(jnp.int32)
        lm_ok = tm.found[lm_rows]
        lm_px = tm.obs_px[lm_rows]
        z = T_cw.apply(mstate.pt_pos[lm_rows])[:, 2]
        # --- new detections away from tracked landmarks ---
        feats = self._jit_detect(pyr, lm_px, lm_ok)
        new_px = feats.px[:Fn]
        new_valid = feats.valid[:Fn]
        new_desc = feats.desc[:Fn]
        new_level = feats.level[:Fn]
        new_angle = feats.angle[:Fn]
        # --- triangulate new features vs the last keyframe ---
        pos_w, good, _ = self._jit_triangulate(
            mstate, new_px, new_desc, new_valid, new_angle,
            T_cw.params7(), self.last_kf_slot,
        )
        if getattr(self, "cur_depth", None) is not None or getattr(
            self, "cur_right", None
        ) is not None:
            # Depth sensor (RGBD image or stereo matching) overrides /
            # extends triangulation.
            zd, dok = self._sensor_depths(pyr, new_px, new_valid)
            pos_d = self.cam.pixel_to_world(new_px, T_cw, depth=zd)
            pos_w = jnp.where(dok[:, None], pos_d, pos_w)
            good = dok | good
        rows_np = srv.alloc_landmark_rows(Fn)
        n_free = len(rows_np)
        rows = jnp.full(Fn, L - 1, jnp.int32)
        if n_free:
            rows = rows.at[:n_free].set(jnp.asarray(rows_np))
        can_write = good & (jnp.arange(Fn) < n_free)
        # --- assemble the keyframe's feature table ---
        feat_px = jnp.concatenate([lm_px, new_px])
        feat_level = jnp.concatenate(
            [jnp.zeros(Fl, jnp.int32), new_level]
        )
        # Landmark-observation rows get descriptors recomputed on THIS
        # keyframe's image (stale creation-time descriptors degrade
        # BoW relocalization against later keyframes).
        lm_angle, lm_desc = self._jit_describe_at(pyr[0], lm_px)
        feat_angle = jnp.concatenate([lm_angle, new_angle])
        feat_desc = jnp.concatenate([lm_desc, new_desc])
        z_new = T_cw.apply(pos_w)[:, 2]
        feat_depth = jnp.concatenate(
            [jnp.where(lm_ok, z, -1.0), jnp.where(can_write, z_new, -1.0)]
        )
        feat_point = jnp.concatenate(
            [jnp.where(lm_ok, lm_rows, -1),
             jnp.where(can_write, rows, -1)]
        )
        feat_valid = jnp.concatenate([lm_ok, new_valid])
        slot = srv.register_keyframe(
            self.frame_id, T_cw, feat_px, feat_level, feat_angle,
            feat_desc, feat_depth, feat_point, feat_valid,
        )
        self._store_bow(slot, feat_desc, feat_valid)
        # Refresh landmark representative descriptors from this
        # keyframe's re-described observations (the distinctive-
        # descriptor maintenance the reference commented out,
        # src/Basic/MapPoint.cpp:10-47) — without it, pt_desc ages out
        # of matching range within a few keyframes.
        pd = srv.state.pt_desc.at[lm_rows].set(
            jnp.where(lm_ok[:, None], lm_desc,
                      srv.state.pt_desc[lm_rows])
        )
        srv.state = srv.state._replace(pt_desc=pd)
        # New landmarks reference their creating feature's patch.
        srv.state = ms.add_landmarks(
            srv.state, rows, can_write, pos_w, new_desc, slot,
            ref_feat=slot * Fcap + Fl + jnp.arange(Fn, dtype=jnp.int32),
        )
        self.kf_images = self.kf_images.at[slot].set(pyr[0])
        # SearchInNeighbors: fuse unlinked features with existing
        # landmarks BEFORE seeds are created for them (a fused feature
        # must not also spawn a seed that would later duplicate the
        # landmark) and before BA so fused observations participate.
        srv.state = self._jit_fuse_neighbors(srv.state, jnp.asarray(slot))
        self._refresh_semidense(pyr, slot)
        # --- depth filter: promote converged seeds, start new ones ---
        if self.o.use_depth_filter:
            self._promote_seeds()
            fp_now = srv.state.feat_point[slot][Fl + jnp.arange(Fn)]
            depthless = new_valid & (~can_write) & (fp_now < 0)
            if bool(depthless.any()):
                mean_d = float(jnp.where(
                    mstate.pt_valid,
                    SE3.from_params7(mstate.kf_pose7[self.last_kf_slot])
                    .apply(mstate.pt_pos)[:, 2],
                    0.0,
                ).sum() / max(int(mstate.pt_valid.sum()), 1)) or 1.0
                self.seeds = dfilt.Seeds.init(
                    new_px, depthless,
                    depth_mean=max(mean_d, 0.5), depth_min=0.1,
                )
                self.seed_kf_slot = slot
                self.seed_feat_idx = Fl + jnp.arange(Fn, dtype=jnp.int32)
        self._finish_insert(pyr, T_cw, slot)

    def _finish_insert(self, pyr, T_cw, slot):
        """Common tail of keyframe insertion: bookkeeping + the
        mapping pass (synchronous or on the worker thread)."""
        o = self.o
        self.last_kf_slot = slot
        self.frames_since_kf = 0
        kf_fid = self.frame_id
        if o.async_mapping:
            # Decoupled mapping (the reference DECLARED the ORB-SLAM
            # three-thread split but never wired it, system.h:80-83):
            # the expensive keyframe work — loop detection, local BA,
            # culling — runs on a worker thread, overlapping the
            # caller's next-frame acquisition; every state consumer
            # joins first (_join_mapping), so results are EXACTLY the
            # synchronous ones, just off the frame-return path.
            self._last_kf_fid = kf_fid
            self._last_kf_pose7 = np.asarray(
                T_cw.params7(), np.float32
            )  # provisional; finalized (post-BA) at join
            import threading
            self._map_fixup_start = len(self.traj_rel)

            def _work():
                try:
                    self._map_pending_pose7 = (
                        self._keyframe_mapping_pass(slot, kf_fid)
                    )
                except BaseException as e:   # re-raised at join
                    self._map_exc = e

            # Non-daemon: a daemon jit-dispatching thread alive at
            # interpreter teardown aborts the process ("FATAL:
            # exception not rethrown"); the pass is bounded work and
            # exit joins it cleanly.
            self._map_thread = threading.Thread(
                target=_work, name="ygz-mapping", daemon=False
            )
            self._map_thread.start()
            return
        pose7_slot = self._keyframe_mapping_pass(slot, kf_fid)
        self._finish_keyframe(pose7_slot)

    def _finish_keyframe(self, pose7_slot):
        """Publish the mapping pass's host-visible pose state: tracking
        continues against the BA/loop-refined keyframe pose."""
        self.prev_T_cw = SE3.from_params7(jnp.asarray(pose7_slot))
        self.T_cw = self.prev_T_cw
        self._last_kf_pose7 = np.asarray(pose7_slot, np.float32)

    def _join_mapping(self):
        """Barrier for the async mapping thread: applies the deferred
        host-pose updates and re-anchors trajectory entries appended
        while the pass was in flight (at most the keyframe's own frame),
        making the exported trajectory identical to synchronous mode."""
        th = getattr(self, "_map_thread", None)
        if th is None:
            return
        th.join()
        self._map_thread = None
        exc = getattr(self, "_map_exc", None)
        if exc is not None:
            self._map_exc = None
            raise exc
        self._finish_keyframe(self._map_pending_pose7)
        # Deterministic fix-up: entries anchored on the new keyframe
        # recompute their relative pose against its FINAL (post-BA)
        # pose — exactly what the synchronous path records.
        for i in range(self._map_fixup_start, len(self.traj_rel)):
            ts, fid, _ = self.traj_rel[i]
            if fid == self._last_kf_fid:
                abs7 = self.trajectory[i][1]
                self.traj_rel[i] = (ts, fid, np_se3.relative7(
                    abs7, self._last_kf_pose7
                ).astype(np.float32))

    def _keyframe_mapping_pass(self, slot, kf_fid):
        """Loop closing + local BA + culling for a just-inserted
        keyframe (LocalMapping::Run, LocalMapping.cpp:301-336 — the
        work the reference intended for its mapping thread).  Thread-
        safe against the tracking path under the _join_mapping
        discipline; returns the keyframe's refined pose7 (np)."""
        o, srv = self.o, self.server
        # --- ONE fused device pass: covis refresh + active-window
        # loop detect/close + local BA + culling + redundancy scores
        # (round-5; the archive loop below keeps its own conditional
        # dispatch).  NOTE the round-5 ordering change: an ARCHIVE
        # loop closure now applies after this pass's local BA rather
        # than before it — the global pose-graph correction lands on
        # BA-refined poses; the next keyframe's BA re-smooths either
        # way.
        enable_loop = (self.vocab is not None and o.loop_closing
                       and len(srv.kf_used) >= 4)
        fixed = np.zeros(o.map_K, bool)
        oldest = srv.kf_used[0]
        fixed[oldest] = True
        if len(srv.kf_used) > 1:
            fixed[srv.kf_used[1]] = True
        if self.vocab is not None:
            (srv.state, found_dev, scores_dev, pose7_dev,
             id_dev) = self._jit_map_pass(
                srv.state, jnp.asarray(slot), self.kf_bow,
                self.kf_nodes, jnp.asarray(fixed), enable_loop,
            )
        else:
            (srv.state, found_dev, scores_dev, pose7_dev,
             id_dev) = self._jit_map_pass(
                srv.state, jnp.asarray(slot),
                jnp.zeros((o.map_K, 1), jnp.float32),
                jnp.full((o.map_K, o.map_F), -1, jnp.int32),
                jnp.asarray(fixed), enable_loop,
            )
        lp_found, scores, pose7_np, id_np = jax.device_get(
            (found_dev, scores_dev, pose7_dev, id_dev)
        )
        closed = bool(lp_found)
        if closed:
            self.stats["loops_closed_active"] += 1
        if self.vocab is not None and o.loop_closing:
            cooled = (kf_fid - getattr(self, "_last_loop_fid", -10**9)
                      >= o.loop_cooldown_frames)
            if (not closed and self.archive is not None
                    and self.archive.count > 0 and cooled):
                # Long-range loops against ARCHIVED keyframes: the
                # capability the fixed window alone cannot provide.
                lpa = self._jit_loop_arc(
                    jnp.asarray(slot), jnp.asarray(kf_fid),
                    self.kf_bow, self.kf_nodes, srv.state,
                    self.archive.device_view(),
                )
                if bool(lpa.found):
                    row_epoch = self.archive.epoch_of(int(lpa.loop_kf))
                    if row_epoch != self.epoch:
                        # Cross-epoch hit: the matched row lives in a
                        # PRE-RESET world frame.  A pose graph cannot
                        # bridge disconnected worlds — MERGE instead:
                        # rebase this (young) epoch into the old one
                        # by the measured Sim(3).
                        self._merge_epochs(slot, lpa, row_epoch)
                        self.stats["maps_merged"] += 1
                        self._last_loop_fid = kf_fid
                    elif self._loop_correction_significant(slot, lpa):
                        self._close_loop_global(slot, lpa)
                        self.stats["loops_closed_global"] += 1
                        self._last_loop_fid = kf_fid
                    else:
                        # The verified revisit agrees with the map
                        # within the verifier's noise floor: closing
                        # it would inject that noise via the pose
                        # graph instead of removing drift (measured:
                        # unconditional closures DOUBLED benchmark
                        # ATE).  Count it as confirmation.
                        self.stats["loops_confirmed"] += 1
                    if self._last_loop_fid == kf_fid:
                        # An applied correction (merge or global
                        # closure) rewrote the active poses AFTER the
                        # fused pass's snapshot; refresh the log
                        # source (rare — gated closures fire ~30x per
                        # 2000-frame run).
                        pose7_np = np.asarray(srv.state.kf_pose7)
                        id_np = np.asarray(srv.state.kf_id)
        # --- keyframe culling from the in-pass redundancy scores ---
        self._cull_keyframes(protect={slot, oldest}, scores=scores)
        # Refresh the host-side keyframe pose log (trajectory
        # anchoring) with the BA/loop-refined active poses (fetched
        # in the fused pass's device_get).
        for s in srv.kf_used:
            fid_s = int(id_np[s])
            self.kf_pose_log[fid_s] = pose7_np[s].copy()
            self._fid_epoch.setdefault(fid_s, self.epoch)
        self._last_kf_fid = int(id_np[slot])
        if log.isEnabledFor(logging.INFO):
            m = srv.state
            log.info(
                "keyframe %d -> slot %d: landmarks=%d active_kfs=%d "
                "archived=%d loops(active/global)=%d/%d",
                kf_fid, slot, int(np.asarray(m.pt_valid).sum()),
                len(srv.kf_used),
                self.archive.count if self.archive else 0,
                self.stats["loops_closed_active"],
                self.stats["loops_closed_global"],
            )
        return pose7_np[slot].copy()

    # -- semi-dense / dense map maintenance ------------------------------
    def _mean_map_depth(self, slot) -> float:
        m = self.server.state
        z = m.kf_pose(slot).apply(m.pt_pos)[:, 2]
        sel = m.pt_valid & (z > 0.05)
        n = int(sel.sum())
        if n == 0:
            return 1.0
        return float(jnp.where(sel, z, 0.0).sum() / n)

    def _accumulate_dense(self, pyr, slot, stride: int = 4):
        """DENSE map content: back-project the keyframe's depth image
        (RGBD sensor) into a world point cloud (host-side; the DENSE
        map type of legacy system.h:33-37)."""
        import numpy as _np

        d = _np.asarray(self.cur_depth)
        H, W = d.shape
        ys, xs = _np.mgrid[0:H:stride, 0:W:stride]
        z = d[ys, xs].reshape(-1)
        ok = _np.isfinite(z) & (z > 0.05)
        if not ok.any():
            return
        px = _np.c_[xs.reshape(-1)[ok], ys.reshape(-1)[ok]].astype(
            _np.float32
        )
        T_cw = self.server.state.kf_pose(slot)
        pts = self.cam.pixel_to_world(
            jnp.asarray(px), T_cw, depth=jnp.asarray(z[ok], jnp.float32)
        )
        self.dense_cloud.append(_np.asarray(pts))

    def _refresh_semidense(self, pyr, slot):
        """At each new keyframe: export the outgoing keyframe's
        converged gradient-pixel seeds into the semi-dense cloud, then
        seed a fresh gradient-pixel set on the new keyframe."""
        o = self.o
        needs_sd = (
            o.vo_type is VOType.SEMI_DENSE_DIRECT
            or o.map_type is MapType.SEMI_DENSE
        )
        if o.map_type is MapType.DENSE and self.cur_depth is not None:
            self._accumulate_dense(pyr, slot)
        if not needs_sd:
            return
        if self.sd is not None:
            pts, ok = self._jit_sd_export(self.sd, self.server.state)
            ok_np = np.asarray(ok)
            if ok_np.any():
                self.semidense_cloud.append(np.asarray(pts)[ok_np])
        mean_d = self._mean_map_depth(slot)
        self.sd = self._jit_sd_init(
            pyr[0], slot, jnp.asarray(max(mean_d, 1e-2), jnp.float32)
        )

    def export_point_cloud(self) -> np.ndarray:
        """The configured map type's point content as [N, 3] world
        coordinates: landmarks (SPARSE) + semi-dense keyframe depth
        maps (SEMI_DENSE) + back-projected depth images (DENSE)."""
        self._join_mapping()
        m = self.server.state
        sel = np.asarray(m.pt_valid)
        clouds = [np.asarray(m.pt_pos)[sel]]
        if self.sd is not None:
            pts, ok = self._jit_sd_export(self.sd, m)
            clouds.append(np.asarray(pts)[np.asarray(ok)])
        clouds.extend(self.semidense_cloud)
        clouds.extend(self.dense_cloud)
        return (
            np.concatenate(clouds, axis=0) if clouds
            else np.zeros((0, 3), np.float32)
        )

    # -- LOST -----------------------------------------------------------
    def _promote_seeds(self):
        """Converged seeds become landmarks linked to their keyframe
        feature (the promotion the legacy depth filter was built for)."""
        if self.seeds is None:
            return
        srv, o = self.server, self.o
        conv = self.seeds.converged(ratio=100.0) & self.seeds.valid
        n_conv = int(conv.sum())
        if n_conv == 0:
            self.seeds = None
            return
        rows_np = srv.alloc_landmark_rows(int(conv.shape[0]))
        n_free = len(rows_np)
        L = o.map_L
        n = conv.shape[0]
        rows = jnp.full(n, L - 1, jnp.int32)
        if n_free:
            rows = rows.at[:n_free].set(jnp.asarray(rows_np))
        slot = self.seed_kf_slot
        m = srv.state
        # Never overwrite links created since the seeds were made
        # (e.g. by SearchInNeighbors fusion at a later keyframe).
        still_free = m.feat_point[slot][self.seed_feat_idx] < 0
        can = conv & still_free & (jnp.arange(n) < n_free)
        T_kf = m.kf_pose(slot)
        pos_w = self.cam.pixel_to_world(
            self.seeds.px, T_kf, depth=self.seeds.depth()
        )
        desc = m.feat_desc[slot][self.seed_feat_idx]
        srv.state = ms.add_landmarks(
            srv.state, rows, can, pos_w, desc, slot,
            ref_feat=slot * o.map_F + self.seed_feat_idx,
        )
        # Link the keyframe features to the new landmarks.
        m = srv.state
        fp = m.feat_point[slot].at[self.seed_feat_idx].set(
            jnp.where(can, rows, m.feat_point[slot][self.seed_feat_idx])
        )
        fd = m.feat_depth[slot].at[self.seed_feat_idx].set(
            jnp.where(can, self.seeds.depth(),
                      m.feat_depth[slot][self.seed_feat_idx])
        )
        srv.state = m._replace(
            feat_point=m.feat_point.at[slot].set(fp),
            feat_depth=m.feat_depth.at[slot].set(fd),
        )
        self.seeds = None

    def _cull_keyframes(self, protect, redundancy_th: float = 0.9,
                        scores=None):
        """KeyFrameCulling (LocalMapping.cpp:579-618): evict keyframes
        >90% of whose landmarks are seen by >=3 other keyframes.
        Keeps a minimum window of `kf_cull_min_window` keyframes.

        `scores`: precomputed [K] redundancy scores (the fused mapping
        pass computes them on device — zero extra fetches); falls back
        to the native host scorer when absent (sensor paths)."""
        srv = self.server
        min_win = self.o.kf_cull_min_window
        if len(srv.kf_used) <= min_win:
            return
        if scores is None:
            from .. import native

            m = srv.state
            # Scale-aware rule: only finer-or-equal-level observations
            # make an observation redundant (LocalMapping.cpp:592-607).
            scores = native.kf_redundancy_scale(
                np.asarray(m.feat_point), np.asarray(m.feat_valid),
                np.asarray(m.feat_level), L=self.o.map_L, min_obs=4,
            )
        evicted = False
        for slot in list(srv.kf_used):
            if slot in protect or len(srv.kf_used) <= min_win:
                continue
            if scores[slot] > redundancy_th:
                srv.evict_kf(slot)
                evicted = True
        if evicted:
            srv.refresh_covisibility()

    def _handle_lost(self, pyr):
        """Relocalization TODO in the reference (:101-104); here: retry
        tracking against the last keyframe with the motion model reset,
        then hard-reset after `lost_reset_frames` failures."""
        self.lost_count += 1
        self.velocity = SE3.identity()
        tm, new_state, _ = self._run_tracker(pyr, self.prev_T_cw)
        retry_ok = int(tm.n_inliers) >= self.o.min_track_inliers
        if log.isEnabledFor(logging.DEBUG):
            log.debug("lost retry %d: inliers=%d (need %d)",
                      self.lost_count, int(tm.n_inliers),
                      self.o.min_track_inliers)
        if retry_ok:
            # Descriptor re-verification (CheckFrameDescriptors,
            # Matcher.cpp:45-84) — on self-similar texture the direct
            # retry can latch COHERENTLY onto wrong minima and pass the
            # chi2 gate ("perceptual aliasing"); photometric latches at
            # the wrong scene location do not survive an ORB Hamming
            # check against the landmarks' descriptors.  The bar stays
            # at the FULL gate (a round-5 floor-level experiment let
            # weakly-supported retries re-acquire at wrong/displaced
            # poses — odometric RPE 0.59 vs 0.12 on the flagship run).
            m = self.server.state
            d = self._jit_desc_check(m.pt_desc, pyr[0], tm.obs_px)
            consistent = (np.asarray(tm.found)
                          & (np.asarray(d) <= self.o.lost_desc_max_dist))
            retry_ok = int(consistent.sum()) >= self.o.min_track_inliers
            if log.isEnabledFor(logging.DEBUG):
                log.debug("lost retry desc-check: %d consistent of %d",
                          int(consistent.sum()), int(tm.n_inliers))
        if retry_ok:
            self.status = Status.GOOD
            self.server.state = new_state
            self.prev_pyr = pyr
            self.prev_T_cw = tm.T_cw
            self.T_cw = tm.T_cw
            self.prev_found = tm.found
            self.prev_obs_px = tm.obs_px
            return TrackResult(Status.GOOD, tm.T_cw, int(tm.n_inliers))
        # The retry recovers AT the pre-loss pose (no trajectory
        # discontinuity); a relocalization lands on an archived/BoW
        # keyframe's frame and injects a pose jump relative to local
        # drift.  Give the jump-free retry `lost_reloc_after` frames
        # of exclusive attempts before the cascade engages (round-5:
        # immediate reloc turned transient losses into RPE/segment-ATE
        # discontinuities on the flagship benchmark).
        r = (self._try_relocalize(pyr)
             if self.lost_count >= self.o.lost_reloc_after else None)
        if r is not None:
            # Relocalized: resume tracking from the recovered pose.
            self.status = Status.GOOD
            self.prev_pyr = pyr
            self.prev_T_cw = r.T_cw
            self.T_cw = r.T_cw
            L = self.o.map_L
            if self._last_reloc_arc_idx is not None:
                # Archive hit: the active map is elsewhere — restore
                # the matched keyframe + its landmarks into the window
                # so tracking continues in the revisited region.
                found, obs_px = self._reactivate_archived(
                    self._last_reloc_arc_idx, r.T_cw
                )
                self.prev_found = found
                self.prev_obs_px = obs_px
            else:
                self.prev_found = jnp.zeros(L, bool)
                self.prev_obs_px = jnp.zeros((L, 2), jnp.float32)
            self.velocity = SE3.identity()
            return TrackResult(Status.GOOD, r.T_cw, int(r.n_inliers))
        if self.lost_count > self.o.lost_reset_frames:
            self.reset()
        return TrackResult(Status.LOST, self.T_cw)

    def _arc_dummy_view(self, cap: int):
        """All-invalid ArchiveView of capacity `cap` (warmup input)."""
        from ..map.archive import ArchiveView
        F = self.archive.F
        W = self.archive.W
        ident7 = jnp.tile(
            jnp.asarray([1, 0, 0, 0, 0, 0, 0], jnp.float32), (cap, 1)
        )
        return ArchiveView(
            frame_id=jnp.full((cap,), -1, jnp.int32),
            pose7=ident7,
            bow=jnp.zeros((cap, W), jnp.float32),
            nodes=jnp.full((cap, F), -1, jnp.int32),
            desc=jnp.zeros((cap, F, 8), jnp.uint32),
            px=jnp.zeros((cap, F, 2), jnp.float32),
            angle=jnp.zeros((cap, F), jnp.float32),
            feat_valid=jnp.zeros((cap, F), bool),
            pt_pos=jnp.zeros((cap, F, 3), jnp.float32),
            pt_ok=jnp.zeros((cap, F), bool),
            valid=jnp.zeros((cap,), bool),
        )

    def warmup_archive(self, max_capacity: int = 128) -> None:
        """Pre-compile the archive-capacity jit buckets (archive loop
        detection + archive relocalization) for every power-of-2
        capacity up to `max_capacity`, so archive GROWTH never pays a
        compile on a user-visible step (each first-hit bucket costs the
        full XLA compile — minutes over a remote-compile relay).
        Subsequent growth past max_capacity is covered by the
        automatic compile-ahead in _archive_kf (the next bucket
        compiles on a background thread while the current one is still
        filling).  Executes each bucket once on all-invalid dummy rows
        (masked paths — results discarded)."""
        if self.archive is None or self.vocab is None:
            return
        F = self.o.map_F
        qd = jnp.zeros((F, 8), jnp.uint32)
        qpx = jnp.zeros((F, 2), jnp.float32)
        qv = jnp.zeros((F,), bool)
        qa = jnp.zeros((F,), jnp.float32)
        cap = 16
        while cap <= max_capacity:
            arc = self._arc_dummy_view(cap)
            lp = self._jit_loop_arc(
                jnp.asarray(0), jnp.asarray(0), self.kf_bow,
                self.kf_nodes, self.server.state, arc,
            )
            ra = self._jit_reloc_arc(qd, qpx, qv, qa, arc)
            jax.block_until_ready((lp, ra))
            self._arc_warmed_cap = cap
            cap *= 2

    def _arc_compile_ahead(self):
        """When the archive is one append away from doubling its
        padded capacity, compile the NEXT bucket on a daemon thread —
        by the time rows reach it the executable is cached, so no
        tracking/mapping step ever blocks on an archive-capacity
        retrace (jit caches are thread-safe)."""
        cap = self.archive._capacity()
        if self.archive.count < cap or cap * 2 <= getattr(
            self, "_arc_warmed_cap", 0
        ):
            return
        target = cap * 2
        self._arc_warmed_cap = target
        import threading

        def _work():
            try:
                F = self.o.map_F
                arc = self._arc_dummy_view(target)
                lp = self._jit_loop_arc(
                    jnp.asarray(0), jnp.asarray(0), self.kf_bow,
                    self.kf_nodes, self.server.state, arc,
                )
                ra = self._jit_reloc_arc(
                    jnp.zeros((F, 8), jnp.uint32),
                    jnp.zeros((F, 2), jnp.float32),
                    jnp.zeros((F,), bool),
                    jnp.zeros((F,), jnp.float32), arc,
                )
                jax.block_until_ready((lp, ra))
            except Exception:   # warmup is best-effort
                log.exception("archive compile-ahead failed")

        threading.Thread(
            target=_work, name="ygz-arc-warmup", daemon=False
        ).start()

    def _archive_kf(self, slot: int):
        """MapServer eviction hook: snapshot the keyframe into the
        global archive tier BEFORE its window slot is invalidated
        (restores the reference Memory singleton's keep-everything
        semantics, Basic/Memory.h:16-56, for relocalization and loop
        closing beyond the active window)."""
        m = self.server.state
        fid = int(m.kf_id[slot])
        if fid < 0 or self.archive is None:
            return
        # One batched device->host fetch for the whole record (the
        # per-array np.asarray sequence paid ~11 tunnel round trips
        # per eviction).
        snap = self._jit_arc_snapshot(m, jnp.asarray(slot))
        extras = (self.kf_images[slot],) + (
            (self.kf_bow[slot], self.kf_nodes[slot])
            if self.vocab is not None else ()
        )
        host = jax.device_get(tuple(snap) + extras)
        pose7, desc, px, fvalid, pt_pos, pt_ok, angle, level = host[:8]
        img_u8 = np.clip(host[8], 0, 255).astype(np.uint8)
        if self.vocab is not None:
            bow, nodes = host[9], host[10]
        else:
            bow = np.zeros(1, np.float32)
            nodes = np.full(self.o.map_F, -1, np.int32)
        self.archive.append(
            fid, pose7, bow, nodes, desc, px, fvalid, pt_pos, pt_ok,
            angle=angle, level=level, image=img_u8, epoch=self.epoch,
        )
        self.kf_pose_log[fid] = pose7.copy()
        self._fid_epoch.setdefault(fid, self.epoch)
        self.stats["keyframes_archived"] += 1
        if self.vocab is not None:
            self._arc_compile_ahead()

    def _reactivate_archived(self, arc_idx: int, T_cur: SE3):
        """Restore an archived keyframe into the active window after an
        archive relocalization: pose, features, landmark snapshots and
        the stored image become a live keyframe + landmarks, so
        tracking CONTINUES in the revisited map region instead of
        starving against an active map that is somewhere else entirely
        (the reference's Memory never evicts, so it gets this free).

        Returns (found [L] bool, obs_px [L, 2]) seeds for the sparse
        aligner's next-frame reference set."""
        o, srv = self.o, self.server
        row = self.archive.pop(arc_idx)
        F, L = o.map_F, o.map_L
        slot = srv.alloc_kf_slot()
        ok_np = np.asarray(row["pt_ok"] & row["feat_valid"])
        rows_np = srv.alloc_landmark_rows(int(ok_np.sum()))
        n_free = len(rows_np)
        take = np.where(ok_np)[0][:n_free]
        fp = np.full(F, -1, np.int32)
        fp[take] = rows_np[:len(take)]
        from ..utils import np_se3
        R, t = np_se3.params7_to_Rt(row["pose7"])
        z = (row["pt_pos"] @ R.T + t)[:, 2].astype(np.float32)
        fd = np.where(fp >= 0, z, -1.0).astype(np.float32)
        srv.state = ms.insert_keyframe(
            srv.state, slot, row["frame_id"],
            SE3.from_params7(jnp.asarray(row["pose7"])),
            jnp.asarray(row["px"]), jnp.asarray(row["level"]),
            jnp.asarray(row["angle"]), jnp.asarray(row["desc"]),
            jnp.asarray(fd), jnp.asarray(fp),
            jnp.asarray(row["feat_valid"]),
        )
        srv.kf_used.append(slot)
        write = jnp.asarray(fp >= 0)
        srv.state = ms.add_landmarks(
            srv.state, jnp.asarray(np.clip(fp, 0, L - 1)), write,
            jnp.asarray(row["pt_pos"]), jnp.asarray(row["desc"]), slot,
            ref_feat=slot * F + jnp.arange(F, dtype=jnp.int32),
        )
        img = row["image"]
        if img.shape == tuple(self.kf_images.shape[1:]):
            self.kf_images = self.kf_images.at[slot].set(
                jnp.asarray(img, jnp.float32)
            )
        if self.vocab is not None:
            self.kf_bow = self.kf_bow.at[slot].set(
                jnp.asarray(row["bow"])
            )
            self.kf_nodes = self.kf_nodes.at[slot].set(
                jnp.asarray(row["nodes"])
            )
        srv.refresh_covisibility()
        self.last_kf_slot = slot
        self.frames_since_kf = 0
        self.seeds = None
        self._last_kf_fid = int(row["frame_id"])
        self._last_kf_pose7 = np.asarray(row["pose7"], np.float32)
        self.kf_pose_log[self._last_kf_fid] = self._last_kf_pose7.copy()
        self._fid_epoch[self._last_kf_fid] = int(row.get("epoch",
                                                        self.epoch))
        self.stats["keyframes_reactivated"] += 1
        # Seed the sparse aligner: the reactivated landmarks projected
        # at the relocalized pose are the next frame's reference set.
        m = srv.state
        found = jnp.zeros(L, bool)
        rows_j = jnp.asarray(rows_np[:len(take)])
        if len(take):
            found = found.at[rows_j].set(True)
        obs_px = self.cam.world_to_pixel(m.pt_pos, T_cur)
        return found, obs_px

    def _merge_epochs(self, slot: int, lp, row_epoch: int):
        """Rebase the CURRENT epoch's map into `row_epoch`'s world
        frame (ORB-SLAM3-Atlas-style map merging, here via the Sim(3)
        measured by cross-epoch loop verification).

        Loop verification gave: T_opt (this keyframe's pose in the OLD
        metric, via the PnP-seeded solve against the archived
        landmarks, encoded as lp.T_loop7 = T_opt * T_arc^-1) and
        lp.scale = lambda (current-metric / old-metric length ratio
        from matched-landmark spreads).  The world map
        B: p_cur -> p_old is B(p) = T_opt^-1((R_new p + t_new)/lambda)
        with (R_new, t_new) the keyframe's current pose; poses rebase
        rigidly as R' = R_T R_B^T, t' = t_T/lambda - R' t_B.  By
        construction the merged keyframe lands exactly on T_opt."""
        from ..utils import np_se3

        srv, o = self.server, self.o
        st = srv.state
        lam = float(np.clip(float(lp.scale), 0.2, 5.0))
        T_arc7 = self.archive._rows[int(lp.loop_kf)]["pose7"]
        T_opt7 = np_se3.compose7(np.asarray(lp.T_loop7), T_arc7)
        R_opt, t_opt = np_se3.params7_to_Rt(T_opt7)
        T_new7 = np.asarray(st.kf_pose7[slot])
        R_new, t_new = np_se3.params7_to_Rt(T_new7)
        R_B = R_opt.T @ R_new
        t_B = R_opt.T @ (t_new / lam - t_opt)

        def fn_points(p):
            return ((np.asarray(p, np.float64) @ R_new.T + t_new) / lam
                    - t_opt) @ R_opt

        def fn_pose7(p7):
            R_T, t_T = np_se3.params7_to_Rt(np.asarray(p7))
            R_p = R_T @ R_B.T
            t_p = t_T / lam - R_p @ t_B
            return np_se3.Rt_to_params7(R_p, t_p).astype(np.float32)

        # Active window: poses, landmarks, feature depths (all in map
        # units -> divide by lambda).
        kf7 = np.array(st.kf_pose7)
        for sl in list(srv.kf_used):
            kf7[sl] = fn_pose7(kf7[sl])
        pts = np.array(st.pt_pos)
        pv = np.asarray(st.pt_valid)
        pts[pv] = fn_points(pts[pv]).astype(np.float32)
        depth = np.asarray(st.feat_depth)
        depth = np.where(depth > 0, depth / lam, depth)
        srv.state = st._replace(
            kf_pose7=jnp.asarray(kf7.astype(np.float32)),
            pt_pos=jnp.asarray(pts.astype(np.float32)),
            feat_depth=jnp.asarray(depth.astype(np.float32)),
        )
        # Host pose state.
        self.prev_T_cw = SE3.from_params7(jnp.asarray(
            fn_pose7(np.asarray(self.prev_T_cw.params7()))))
        self.T_cw = SE3.from_params7(jnp.asarray(
            fn_pose7(np.asarray(self.T_cw.params7()))))
        self.velocity = SE3.identity()
        if self._last_kf_fid >= 0:
            self._last_kf_pose7 = fn_pose7(self._last_kf_pose7)
        # Trajectory anchors of THIS epoch's frames only: entries of
        # intermediate epochs live in other world frames and must not
        # be transformed by this Sim(3).
        for fid, p7 in list(self.kf_pose_log.items()):
            if self._fid_epoch.get(fid, self.epoch) == self.epoch:
                self.kf_pose_log[fid] = fn_pose7(p7)
                self._fid_epoch[fid] = row_epoch
        # This epoch's archived rows, then relabel the epoch.
        self.archive.rebase_epoch(self.epoch, fn_pose7, fn_points)
        self.archive.set_epoch(self.epoch, row_epoch)
        # Scale-dependent transient state is dropped.
        self.seeds = None
        self.sd = None
        log.info("merged epoch %d into %d (lambda=%.3f) at kf %d",
                 self.epoch, row_epoch, lam, slot)
        self.epoch = row_epoch

    def _loop_correction_significant(self, slot: int, lp) -> bool:
        """Is the pose correction a verified archive loop implies for
        the new keyframe larger than the verifier's noise floor?
        Compares the loop-measured pose T_meas = T_loop o T_arc
        against the keyframe's current pose; the loop is worth closing
        only when translation / rotation / scale disagreement exceeds
        the configured thresholds (map units / rad / |ln s|)."""
        o = self.o
        T_arc7 = self.archive.poses7()[int(lp.loop_kf)]
        T_meas7 = np_se3.compose7(np.asarray(lp.T_loop7), T_arc7)
        cur7 = np.asarray(self.server.state.kf_pose7[slot])
        d7 = np_se3.relative7(T_meas7, cur7)
        dt = float(np.linalg.norm(d7[4:7]))
        dr = 2.0 * float(np.arccos(np.clip(abs(d7[0]), 0.0, 1.0)))
        ds = abs(float(np.log(max(float(lp.scale), 1e-6))))
        sig = (dt > o.loop_min_corr_trans or dr > o.loop_min_corr_rot
               or ds > o.loop_min_corr_scale)
        if log.isEnabledFor(logging.INFO):
            log.info("loop cand kf fid %d <-> arc fid %d (n_inl=%d): "
                     "dt=%.4f dr=%.4f ds=%.4f -> %s",
                     int(self.server.state.kf_id[slot]),
                     int(self.archive.frame_ids()[int(lp.loop_kf)]),
                     int(lp.n_inl),
                     dt, dr, ds, "CLOSE" if sig else "confirm-only")
        return sig

    def _close_loop_global(self, slot: int, lp):
        """Apply a verified archive loop: pose-graph over the FULL
        trajectory (archived + active keyframes), then correct active
        poses + landmarks and archived poses + snapshotted points."""
        srv, o = self.server, self.o
        st = srv.state
        act_slots = list(srv.kf_used)
        pose7_np = np.asarray(st.kf_pose7)
        id_np = np.asarray(st.kf_id)
        cov_np = np.asarray(st.cov_weight)
        act_pose7 = pose7_np[act_slots]
        act_ids = id_np[act_slots]
        act_cov = cov_np[np.ix_(act_slots, act_slots)]
        if o.sim3_loops:
            arc_new, act_new, arc_s, act_s, _chi2 = (
                reloc.close_loop_global_sim3(
                    self.archive.poses7(), self.archive.frame_ids(),
                    act_pose7, act_ids, act_cov,
                    int(lp.loop_kf), act_slots.index(slot),
                    np.asarray(lp.T_loop7),
                    loop_scale=float(lp.scale),
                    n_iter=o.global_pg_iters,
                )
            )
            self.archive.set_poses7(arc_new, scale=arc_s)
            new7 = pose7_np.copy()
            new7[act_slots] = act_new
            scale_full = np.ones(new7.shape[0], np.float32)
            scale_full[act_slots] = act_s
            srv.state = self._jit_apply_corr_sim3(
                st, jnp.asarray(new7), jnp.asarray(scale_full)
            )
        else:
            arc_new, act_new, _chi2 = reloc.close_loop_global(
                self.archive.poses7(), self.archive.frame_ids(),
                act_pose7, act_ids, act_cov,
                int(lp.loop_kf), act_slots.index(slot),
                np.asarray(lp.T_loop7), n_iter=o.global_pg_iters,
            )
            self.archive.set_poses7(arc_new)
            new7 = pose7_np.copy()
            new7[act_slots] = act_new
            srv.state = self._jit_apply_corr(st, jnp.asarray(new7))
        for fid, p in zip(self.archive.frame_ids(), arc_new):
            self.kf_pose_log[int(fid)] = np.asarray(p, np.float32)
        for fid, p in zip(act_ids, act_new):
            self.kf_pose_log[int(fid)] = np.asarray(p, np.float32)

    def trajectory_poses(
        self, corrected: bool = True
    ) -> list[tuple[float, np.ndarray]]:
        """Trajectory with loop-closure corrections applied: each frame
        pose re-composed from its anchor keyframe's CURRENT (corrected)
        pose and the stored relative transform — the standard
        SaveTrajectory construction, which the pose graph retroactively
        improves.

        `corrected=False` returns the ODOMETRIC trajectory (the poses
        as tracked, before any retroactive pose-graph correction).
        Global corrections shift consecutive frames' anchor keyframes
        by different amounts, so the corrected export trades local
        smoothness (RPE) for global consistency (ATE); the odometric
        export keeps frame-to-frame smoothness.  Export both to get
        the ATE win and RPE parity at once (ORB-SLAM ships the same
        pair as KeyFrameTrajectory vs frame trajectory)."""
        self._join_mapping()
        if not corrected:
            return [(ts, abs7) for ts, abs7 in self.trajectory]
        out: list[tuple[float, np.ndarray]] = []
        for (ts, abs7), (_, fid, rel7) in zip(
            self.trajectory, self.traj_rel
        ):
            if fid >= 0 and fid in self.kf_pose_log:
                out.append((ts, np_se3.compose7(
                    rel7, self.kf_pose_log[fid]
                ).astype(np.float32)))
            else:
                out.append((ts, abs7))
        return out

    def set_vocabulary(self, vocab, recompute: bool = True):
        """Swap in a new BoW vocabulary (loaded from a saved map or
        retrained): rebuilds the jit closures (they capture the vocab
        tables) and, with `recompute`, regenerates every stored BoW
        vector/node table — active window AND archive — so matching
        stays consistent."""
        self._join_mapping()
        self.vocab = vocab
        o = self.o
        self._build_jits()
        if not recompute:
            self.kf_bow = jnp.zeros(
                (o.map_K, vocab.n_words), jnp.float32
            )
            self.kf_nodes = jnp.full((o.map_K, o.map_F), -1, jnp.int32)
            return
        m = self.server.state
        bow_all, nodes_all = jax.jit(jax.vmap(self._jit_kf_bow))(
            m.feat_desc, m.feat_valid & m.kf_valid[:, None]
        )
        self.kf_bow = jnp.where(
            m.kf_valid[:, None], bow_all,
            jnp.zeros((o.map_K, vocab.n_words), jnp.float32),
        )
        self.kf_nodes = jnp.where(m.kf_valid[:, None], nodes_all, -1)
        if self.archive is not None and self.archive.count:
            fn = self._jit_kf_bow
            self.archive.recompute_bow(
                lambda d, v: fn(jnp.asarray(d), jnp.asarray(v)),
                vocab.n_words,
            )

    def refresh_vocabulary(self, k: int | None = None,
                           depth: int | None = None,
                           min_descriptors: int = 200) -> bool:
        """Retrain the vocabulary from THIS run's accumulated keyframe
        descriptors (active window + archive) — replacing the
        synthetic-texture bootstrap words with scene-adapted ones (the
        discrimination role of DBoW3's large pretrained ORBvoc,
        SURVEY §2.3, which is a missing blob in the reference tree).
        Returns False when too few descriptors have accumulated."""
        if self.vocab is None:
            return False
        self._join_mapping()
        m = self.server.state
        descs = [np.asarray(m.feat_desc.reshape(-1, 8))[
            np.asarray((m.feat_valid & m.kf_valid[:, None]).reshape(-1))
        ]]
        if self.archive is not None:
            for r in self.archive._rows:
                descs.append(r["desc"][r["feat_valid"]])
        all_desc = np.concatenate(descs, axis=0)
        if all_desc.shape[0] < min_descriptors:
            return False
        new = voc.train(
            all_desc,
            k=k or self.vocab.k,
            depth=depth or self.vocab.depth,
            iters=4,
        )
        self.set_vocabulary(new, recompute=True)
        self.stats["vocab_refreshes"] += 1
        return True

    def _store_bow(self, slot, feat_desc, feat_valid):
        """Frame::ComputeBoW equivalent at keyframe registration
        (src/Basic/Frame.cpp:190-201)."""
        if self.vocab is None:
            return
        bow, nodes = self._jit_kf_bow(feat_desc, feat_valid)
        self.kf_bow = self.kf_bow.at[slot].set(bow)
        self.kf_nodes = self.kf_nodes.at[slot].set(nodes)

    def _try_relocalize(self, pyr):
        """BoW relocalization (closes the reference's TODO at
        VisualOdometry.cpp:101-104)."""
        if self.vocab is None:
            return None
        feats = self._jit_detect_free(pyr)
        r = self._jit_reloc(
            feats.desc, feats.px, feats.valid, feats.angle,
            self.kf_bow, self.kf_nodes, self.server.state,
        )
        self._last_reloc_arc_idx = None
        if log.isEnabledFor(logging.DEBUG):
            log.debug("reloc active: success=%s inliers=%d kf=%d",
                      bool(r.success), int(r.n_inliers), int(r.kf_slot))
        if bool(r.success):
            return r
        if self.archive is not None and self.archive.count > 0:
            # Cascade to the global tier: archived keyframes the
            # active window can no longer reach.  Only CURRENT-epoch
            # rows are candidates — old epochs live in other world
            # frames; rejoining them is the keyframe-time merge
            # path's job, with a measured Sim(3) bridge.
            arc = self.archive.device_view()
            ep = self.archive.epochs()
            ep_pad = np.zeros(arc.valid.shape[0], np.int32) - 1
            ep_pad[:len(ep)] = ep
            arc = arc._replace(valid=arc.valid & jnp.asarray(
                ep_pad == self.epoch))
            ra = self._jit_reloc_arc(
                feats.desc, feats.px, feats.valid, feats.angle, arc,
            )
            if log.isEnabledFor(logging.DEBUG):
                log.debug("reloc archive: success=%s inliers=%d row=%d",
                          bool(ra.success), int(ra.n_inliers),
                          int(ra.kf_slot))
            if bool(ra.success):
                self.stats["relocs_archive"] += 1
                self._last_reloc_arc_idx = int(ra.kf_slot)
                return ra
        return None

    def reset(self):
        """Full reset (System::Reset surface)."""
        self._join_mapping()
        o = self.o
        # Preserve the old map before discarding the window: every
        # still-active keyframe archives into its (closing) epoch, so
        # a later cross-epoch loop can merge the next map back.
        if self.archive is not None:
            for slot in list(self.server.kf_used):
                self._archive_kf(slot)
        self.server = MapServer(o.map_K, o.map_F, o.map_L)
        if self.archive is not None:
            # Re-wire the eviction hook on the FRESH server: without
            # it every post-reset eviction silently drops the keyframe
            # instead of archiving it, starving archive reloc / loop
            # closure / cross-epoch merging of post-reset history
            # (round-3 advisor finding).
            self.server.on_evict = self._archive_kf
        self.status = Status.NOT_READY
        self.T_cw = SE3.identity()
        self.velocity = SE3.identity()
        self.prev_pyr = None
        self.init_pyr = None
        self.frames_since_kf = 0
        self.last_kf_slot = -1
        self.lost_count = 0
        self.seeds = None
        self.seed_kf_slot = -1
        self.sd = None
        self.semidense_cloud = []
        self.dense_cloud = []
        self._last_kf_fid = -1
        if self.archive is not None:
            # The new map gets a FRESH world frame (a new EPOCH), but
            # the old map's geometry is NOT discarded: the active
            # window archives first, and all archived rows keep their
            # epoch tag.  LOST-relocalization only consults the
            # current epoch (old-epoch poses live in another frame),
            # but keyframe-time loop detection sees every epoch — a
            # verified cross-epoch loop triggers _merge_epochs, which
            # rebases the young map into the old world frame by the
            # measured Sim(3) (ORB-SLAM3-Atlas-style map merging; the
            # reference's keep-everything Memory never faces this).
            self.epoch += 1
        if self.vocab is not None:
            self.kf_bow = jnp.zeros_like(self.kf_bow)
            self.kf_nodes = jnp.full_like(self.kf_nodes, -1)
