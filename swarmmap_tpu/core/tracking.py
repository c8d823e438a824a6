"""Per-frame tracking state machine.

Reference spec: Tracking (/root/reference/code/src/Tracking.cc) —
monocular initialization, motion-model / reference-keyframe tracking,
relocalization, local-map tracking, keyframe decision, and the STS
signals (tracked-point counts, sliding-window velocity with burst
detection, Tracking.cc:1341-1416).

Device programs do every batch computation (matching, pose optimization,
two-view init, PnP); this module is the host-side policy around them.
"""
from __future__ import annotations

import dataclasses
import enum
from collections import deque

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import matching, pnp, pose_opt, twoview
from ..ops import ba as ba_ops
from ..utils.config import Settings
from ..utils.device import fetch
from ..utils.padding import bucket_size, pad_rows, pad_slots
from ..utils.logging import get_logger
from .frame import Frame, build_frame, _frame_ids
from .keyframe_db import KeyFrameDatabase
from .map_store import NO_MP, MapStore

_log = get_logger("tracking")


@jax.jit
def _batched_bow_match(nodes_b, qval_b, desc_b, f_nodes, f_valid, f_desc):
    """SearchByBoW against a fixed-size bank of candidate keyframes in
    ONE program (relocalization runs every frame while lost; per-
    candidate dispatches cost a device round trip each)."""
    def per(nodes, qval, desc):
        m = matching.node_mask(nodes, f_nodes, qval, f_valid)
        return matching.masked_match(desc, f_desc, m,
                                     max_dist=matching.TH_LOW, ratio=0.75)

    return jax.vmap(per)(nodes_b, qval_b, desc_b)


class TrackingState(enum.Enum):
    """reference: TrackingState enum, Tracking.h:64-70"""
    SYSTEM_NOT_READY = -1
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


@dataclasses.dataclass
class TrackingParams:
    init_min_matches: int = 80
    init_window: float = 100.0
    motion_window_th: float = 15.0
    local_window_th: float = 3.0
    min_inliers_motion: int = 10
    min_inliers_local: int = 30
    min_inliers_reloc: int = 20
    kf_ref_ratio: float = 0.9
    kf_min_inliers: int = 15
    max_local_mps: int = 4096
    velocity_window: int = 10      # STS sliding window (Tracking.cc:1364)
    burst_factor: float = 1.2
    # steady-state frames run as ONE fused device program (extraction +
    # local-map matching + pose optimization); falls back to the staged
    # host path on low inliers / lost / distorted cameras
    use_fused_step: bool = True
    fused_window_th: float = 12.0
    fused_local_bucket: int = 2048
    # dynamic-object filtering (reference: Dynamic_ORB_SLAM2 voting,
    # MapPoint.h:129-132). Off by default, like the reference's mono
    # entry points; when on, pose-opt outliers feed the vote ledger and
    # dynamic-voted points are excluded from tracking candidate sets.
    dynamic_filter: bool = False
    # appearance segmenter hook (reference: DynamicExtractor.cc runs a
    # Mask-RCNN through cv::dnn).  "conv" loads the shipped tiny conv
    # (data/dyn_segmenter.npz, tools/train_dyn_segmenter.py); a callable
    # is used directly as segment_fn(image)->bool mask.  New keyframes'
    # images are segmented (every dynamic_segment_every-th, flow-
    # propagated in between) and observed points voted dynamic/static.
    dynamic_segment: object = None
    dynamic_segment_every: int = 1
    # RECENTLY_LOST grace window (frames): on a marginal local-map
    # failure, hold the constant-velocity motion model and keep retrying
    # full tracking instead of dropping straight to relocalization.  The
    # reference (ORB-SLAM2 lineage) goes LOST immediately at <30 inliers,
    # which on a loop circuit strands the agent until the trajectory
    # re-enters mapped territory; the grace window (the mechanism
    # ORB-SLAM3 later added as RECENTLY_LOST) bridges transient dips —
    # e.g. the async mapping worker momentarily behind the tracker.
    # 0 restores exact reference behavior.
    recently_lost_frames: int = 40


@dataclasses.dataclass
class SystemState:
    """STS client state (reference: System::GetSystemState, System.cc:406)."""
    location: np.ndarray
    velocity_burst: bool
    stable: bool
    n_tracked: int
    lost_count: int


class Tracking:
    def __init__(
        self,
        settings: Settings,
        store: MapStore,
        kfdb: KeyFrameDatabase,
        vocab,
        local_mapping=None,
        params: TrackingParams | None = None,
        rng_seed: int = 0,
    ):
        self.settings = settings
        self.store = store
        self.kfdb = kfdb
        self.vocab = vocab
        self.local_mapping = local_mapping
        self.p = params or TrackingParams()
        self.dynamic = None
        if self.p.dynamic_filter or self.p.dynamic_segment is not None:
            from .dynamic import DynamicExtractor, DynamicRunner

            seg = self.p.dynamic_segment
            if seg == "conv":
                from .dynamic import load_segmenter

                seg = load_segmenter()
            ex = (DynamicExtractor(seg, self.p.dynamic_segment_every)
                  if callable(seg) else None)
            self.dynamic = DynamicRunner(store, extractor=ex)
        self.state = TrackingState.NO_IMAGES_YET
        self.init_frame: Frame | None = None
        self.last_frame: Frame | None = None
        self.velocity: np.ndarray | None = None  # Tcl: last->current
        self.ref_kf: int = -1
        # last frame's pose RELATIVE to its reference keyframe (Tlr) —
        # re-anchored every frame so keyframe-pose rewrites (local BA,
        # server DistributeMap, loop correction) move the motion-model
        # prior with the map (reference: Tracking::UpdateLastFrame,
        # Tracking.cc:674 — mLastFrame.SetPose(Tlr*pRef->GetPose()))
        self._last_rel: np.ndarray | None = None
        self._last_ref: int = -1
        self.last_kf_frame_id: int = -1
        self.matches_inliers = 0
        self.reacquire_subthreshold = False
        self.fused_frames = 0     # frames fully tracked by the fused program
        self.lost_count = 0
        self.grace = 0  # consecutive RECENTLY_LOST frames
        self._key = jax.random.PRNGKey(rng_seed)
        # STS signals
        self.centers = deque(maxlen=self.p.velocity_window)
        self.velocity_burst = False
        self.mean_speed = 0.0
        self.trajectory: list[tuple[float, np.ndarray]] = []  # (ts, Twc)

    # ------------------------------------------------------------------ utils
    def _split_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    @property
    def scale_factor(self) -> float:
        return self.settings.orb.scale_factor

    @property
    def n_levels(self) -> int:
        return self.settings.orb.n_levels

    # ------------------------------------------------------------------ main
    def grab(self, image: np.ndarray, timestamp: float,
             depth_image: np.ndarray | None = None,
             kp_depth: np.ndarray | None = None,
             features=None) -> np.ndarray | None:
        frame = None
        if (features is None and depth_image is None and kp_depth is None
                and self.fused_eligible()):
            frame = self._track_fused(image, timestamp)
        if frame is None:
            # device extraction runs unlocked; all host-side map access
            # below is serialized against async local mapping
            frame = build_frame(image, timestamp, self.settings.camera,
                                self.settings.orb, depth_image=depth_image,
                                features=features)
            if kp_depth is not None:
                frame.kp_depth = kp_depth
            with self.store.lock:
                if self.state in (TrackingState.NO_IMAGES_YET,
                                  TrackingState.NOT_INITIALIZED):
                    self.state = TrackingState.NOT_INITIALIZED
                    if frame.kp_depth is not None:
                        self._depth_initialization(frame)
                    else:
                        self._monocular_initialization(frame)
                else:
                    self._track(frame)
                self._segment_new_keyframe(frame, image)
        with self.store.lock:
            return self.finish_frame(frame, timestamp)

    # ------------------------------------------------------------ fused path
    def _collect_local_slots(self) -> np.ndarray:
        """Local map for the fused step: last frame's points + everything
        observed by their keyframes (the same neighborhood TrackLocalMap
        builds, assembled BEFORE the device call).  When the union exceeds
        the fused bucket, points from the MOST covisible keyframes win —
        not an arbitrary slot-id prefix."""
        st = self.store
        lf = self.last_frame
        seed_raw = lf.mp[lf.mp != NO_MP]
        seed_arr = np.unique(seed_raw[st.mp_alive[seed_raw]]).astype(np.int64)
        if not len(seed_arr):
            return np.zeros(0, np.int32)
        in_seed = np.zeros(len(st.mp_alive), bool)
        in_seed[seed_arr] = True
        om, okf, _ = st.obs_arrays()
        sel = in_seed[om] & st.kf_alive[okf]
        binc = np.bincount(okf[sel], minlength=st.n_kf)
        order = np.argsort(-binc, kind="stable")
        local_kfs = order[binc[order] > 0][:60].tolist()
        if local_kfs:
            self.ref_kf = int(local_kfs[0])
            # rows in covisibility-weight order; dedup keeps the FIRST
            # occurrence so the strongest keyframes' points survive the
            # bucket cut.  Scatter-based dedup: reversed assignment makes
            # the first occurrence's index win, so the sort runs over
            # the ~2k unique candidates instead of the ~120k row slots
            # (this is the tracker's hot per-frame host path)
            rows = st.kf_kp_mp[np.asarray(local_kfs)]
            flat = rows[rows != NO_MP]
            pos_of = np.full(st.n_mp, -1, np.int32)
            pos_of[flat[::-1]] = np.arange(
                len(flat) - 1, -1, -1, dtype=np.int32)
            cand = np.where((pos_of >= 0) & st.mp_alive[: st.n_mp]
                            & ~in_seed[: st.n_mp])[0]
            extra = cand[np.argsort(pos_of[cand], kind="stable")]
            slots = np.concatenate([seed_arr, extra])
        else:
            slots = seed_arr
        if self.dynamic is not None and len(slots):
            slots = slots[self.dynamic.filter_static(slots)]
        return slots[: self.p.fused_local_bucket].astype(np.int32)

    def fused_eligible(self, image_ok: bool = True) -> bool:
        """True when the next frame can run as the single fused device
        program (steady state, motion model available).  Calibrated
        cameras qualify: undistortion runs inside the fused program
        (pipeline.tracking_step), so EuRoC's k1=-0.283 no longer forces
        every frame onto the staged multi-dispatch path."""
        return (
            self.p.use_fused_step
            and image_ok
            and self.state == TrackingState.OK
            and self.velocity is not None
            and self.last_frame is not None
            and self.last_frame.pose_cw is not None
        )

    def prepare_fused(self, image: np.ndarray):
        """Host-side assembly of the fused-step inputs (no device calls).
        Returns (TrackInputs-of-numpy, slots) or None when the local map
        is too thin — callers then use the staged path."""
        from .. import pipeline

        st = self.store
        self.store.lock.acquire()
        try:
            return self._prepare_fused_locked(st, image, pipeline)
        finally:
            self.store.lock.release()

    def _prepare_fused_locked(self, st, image, pipeline):
        self._reanchor_last_frame()
        # NOTE: the local-map bucket depends on last_frame.mp (the seed
        # set moves every frame) and _collect_local_slots also refreshes
        # self.ref_kf — it must run per frame.  A store.version-keyed
        # cache was tried here and regressed circuit tracking; the
        # per-frame cost is a handful of numpy gathers (<0.5 ms).
        slots = self._collect_local_slots()
        if len(slots) < 50:
            return None
        bucket = self.p.fused_local_bucket
        slots = slots[:bucket]
        n = len(slots)
        pos = np.zeros((bucket, 3), np.float32)
        desc = np.zeros((bucket, 8), np.uint32)
        maxd = np.full(bucket, 1.0, np.float32)
        ok = np.zeros(bucket, bool)
        pos[:n] = st.mp_pos[slots]
        desc[:n] = st.mp_desc[slots]
        maxd[:n] = st.mp_max_dist[slots]
        ok[:n] = True
        Tcw_pred = (self.velocity @ self.last_frame.pose_cw).astype(np.float32)
        inp = pipeline.TrackInputs(
            image=image,
            Tcw_guess=Tcw_pred,
            K=self.settings.camera.K.astype(np.float32),
            dist=self.settings.camera.dist.astype(np.float32),
            mp_pos=pos, mp_desc=desc, mp_max_dist=maxd, mp_valid=ok,
        )
        return inp, slots

    def commit_fused(self, image: np.ndarray, timestamp: float,
                     slots: np.ndarray, Tcw_np, n_inl, match_local,
                     feats_provider) -> Frame:
        """Consume the fused device program's outputs: (pose, inliers,
        matches) are already host numpy; the FEATURE arrays stay on
        device behind `feats_provider` (a callable doing the fetch) and
        only materialize on keyframe / fallback frames — steady frames
        skip that device->host payload entirely."""
        with self.store.lock:
            return self._commit_fused_locked(
                image, timestamp, slots, Tcw_np, n_inl, match_local,
                feats_provider)

    def _commit_fused_locked(self, image, timestamp, slots, Tcw_np, n_inl,
                             match_local, feats_provider) -> Frame:
        st = self.store
        orb = self.settings.orb
        n_inl = int(n_inl)
        match_local = np.asarray(match_local)
        n_kp = len(match_local)
        zero_f = np.zeros(n_kp, np.float32)
        frame = Frame(
            frame_id=next(_frame_ids),
            timestamp=timestamp,
            K=self.settings.camera.K.copy(),
            xy=np.zeros((n_kp, 2), np.float32),
            xy_raw=np.zeros((n_kp, 2), np.float32),
            octave=np.zeros(n_kp, np.int32),
            angle=zero_f, response=zero_f,
            desc=np.zeros((n_kp, 8), np.uint32),
            valid=np.zeros(n_kp, bool),
            hw=image.shape[:2],
            sigma2=zero_f,
            lazy_feats=feats_provider,
            scale_factor=orb.scale_factor,
        )
        has = match_local >= 0
        frame.mp[has] = slots[np.clip(match_local[has], 0, len(slots) - 1)]
        if n_inl < self.p.min_inliers_local:
            # fall back to the staged path with extraction reused
            _log.info("fused step low inliers (%d < %d) at frame %d — "
                      "staged fallback", n_inl, self.p.min_inliers_local,
                      frame.frame_id)
            frame.ensure_features()
            self._track(frame)
            return frame
        frame.pose_cw = np.asarray(Tcw_np)
        self.matches_inliers = n_inl
        self.fused_frames += 1
        tracked = frame.mp[frame.mp != NO_MP]
        st.increase_visible(tracked, log=False)
        st.increase_found(tracked, log=False)
        self.state = TrackingState.OK
        self.lost_count = 0
        self.grace = 0
        self.velocity = frame.pose_cw @ np.linalg.inv(self.last_frame.pose_cw)
        if self._need_new_keyframe(frame):
            self._create_new_keyframe(frame)
            self._segment_new_keyframe(frame, image)
        return frame

    def _segment_new_keyframe(self, frame: Frame, image: np.ndarray):
        """If this frame just became a keyframe and an appearance
        segmenter is configured, run it over the image and vote the
        keyframe's observed points dynamic/static (reference:
        DynamicRunner enqueues (KeyFrame, image) at keyframe creation)."""
        if (self.dynamic is None or self.dynamic.extractor is None
                or frame.frame_id != self.last_kf_frame_id
                or self.ref_kf < 0):
            return
        self.dynamic.enqueue(self.ref_kf, image,
                             score=float(self.matches_inliers))
        self.dynamic.process(1)

    def _reanchor_last_frame(self):
        """UpdateLastFrame (Tracking.cc:674): recompute the last frame's
        pose from its stored keyframe-relative transform, so local BA /
        server distribute pose rewrites between frames propagate into
        the motion-model prior instead of leaving it in a stale gauge
        (the pre-fix symptom: a distribute rebasing 40+ keyframe poses
        kicked the next frame's prior hard enough to seed a runaway
        monocular scale collapse on the circuit's fast-turn section)."""
        lf = self.last_frame
        if (lf is None or lf.pose_cw is None or self._last_rel is None
                or self._last_ref < 0
                or not self.store.kf_alive[self._last_ref]):
            return
        lf.pose_cw = (
            self._last_rel @ self.store.kf_pose_cw[self._last_ref]
        ).astype(np.float32)

    def finish_frame(self, frame: Frame, timestamp: float) -> np.ndarray | None:
        """Post-track bookkeeping shared by grab() and the batched swarm
        path: last-frame slot, trajectory, STS velocity stats."""
        self.last_frame = frame
        st = self.store
        if (frame.pose_cw is not None and 0 <= self.ref_kf < st.n_kf
                and st.kf_alive[self.ref_kf]):
            self._last_rel = frame.pose_cw @ np.linalg.inv(
                st.kf_pose_cw[self.ref_kf])
            self._last_ref = self.ref_kf
        else:
            self._last_rel = None
            self._last_ref = -1
        if frame.pose_cw is not None:
            Twc = np.linalg.inv(frame.pose_cw)
            self.trajectory.append((timestamp, Twc))
            self._update_velocity_stats(Twc[:3, 3])
            return frame.pose_cw
        return None

    def _track_fused(self, image: np.ndarray, timestamp: float) -> Frame | None:
        """One device dispatch for the whole steady-state frame:
        extraction + local-map matching + LM pose optimization
        (pipeline.tracking_step).  Returns the tracked Frame, or None to
        fall back to the staged host path."""
        from .. import pipeline

        prep = self.prepare_fused(image)
        if prep is None:
            return None
        inp, slots = prep
        orb = self.settings.orb
        out = pipeline.tracking_step(
            pipeline.TrackInputs(*(jnp.asarray(x) for x in inp)),
            n_features=orb.n_features, n_levels=orb.n_levels,
            scale=orb.scale_factor, hw=tuple(image.shape[:2]),
            window_th=self.p.fused_window_th,
        )
        feats = out.features
        # small fetch for the steady path; feature arrays stay on device
        # unless the commit decides it needs them (keyframe / fallback)
        Tcw_np, n_inl, match_mp = fetch(out.Tcw, out.n_inliers, out.match_mp)

        def provider():
            return fetch(feats.xy, out.xy_ud, feats.octave, feats.angle,
                         feats.response, feats.desc, feats.valid)

        return self.commit_fused(image, timestamp, slots, Tcw_np, n_inl,
                                 match_mp, provider)

    # ------------------------------------------------------------ initialization
    def _depth_initialization(self, frame: Frame, min_points: int = 50):
        """Stereo/RGB-D bootstrap: back-project keypoints with valid depth
        (reference: Tracking::StereoInitialization) — metric scale, no
        two-view parallax needed."""
        good = frame.valid & (frame.kp_depth > 0)
        if good.sum() < min_points:
            return
        st = self.store
        frame.pose_cw = np.eye(4, dtype=np.float32)
        k = self._insert_keyframe(frame)
        pts = self._backproject(frame, np.where(good)[0])
        for i, kp in enumerate(np.where(good)[0]):
            mp = st.add_map_point(pts[i], frame.desc[kp], ref_kf=k)
            st.add_observation(mp, k, int(kp))
            st.update_normal_and_depth(mp, self.scale_factor, self.n_levels)
            frame.mp[kp] = mp
        st.update_connections(k)
        self.ref_kf = k
        self.last_kf_frame_id = frame.frame_id
        self.state = TrackingState.OK
        _log.info("depth-initialized map with %d points", int(good.sum()))

    @staticmethod
    def _backproject(frame: Frame, kp_idx: np.ndarray) -> np.ndarray:
        """Pixels + depth -> world points through the current pose."""
        K = frame.K
        uv = frame.xy[kp_idx]
        z = frame.kp_depth[kp_idx]
        x = (uv[:, 0] - K[0, 2]) / K[0, 0] * z
        y = (uv[:, 1] - K[1, 2]) / K[1, 1] * z
        pc = np.stack([x, y, z], 1)
        Twc = np.linalg.inv(frame.pose_cw)
        return pc @ Twc[:3, :3].T + Twc[:3, 3]

    def _monocular_initialization(self, frame: Frame):
        if self.init_frame is None or frame.valid.sum() < self.p.init_min_matches:
            if frame.valid.sum() >= self.p.init_min_matches:
                self.init_frame = frame
            return
        ref = self.init_frame
        mask = matching.window_mask(
            jnp.asarray(ref.xy), jnp.asarray(frame.xy), self.p.init_window,
            jnp.asarray(ref.valid), jnp.asarray(frame.valid),
        )
        m = matching.masked_match(
            jnp.asarray(ref.desc), jnp.asarray(frame.desc), mask,
            max_dist=matching.TH_LOW, ratio=0.9,
            angle_q=jnp.asarray(ref.angle), angle_t=jnp.asarray(frame.angle),
            check_rotation=True,
        )
        idx, valid = fetch(m.idx, m.valid)
        idx, valid = np.asarray(idx), np.asarray(valid)
        if valid.sum() < self.p.init_min_matches:
            self.init_frame = frame  # slide the reference forward
            return
        rec = twoview.reconstruct(
            jnp.asarray(ref.xy), jnp.asarray(frame.xy[idx], np.float32),
            jnp.asarray(valid), jnp.asarray(frame.K, jnp.float32),
            self._split_key(),
        )
        ok, inliers, R21, t21, pts3d = fetch(
            rec.success, rec.inliers, rec.R21, rec.t21, rec.pts3d
        )
        if not bool(ok):
            return
        self._create_initial_map(ref, frame, idx, np.asarray(inliers),
                                 np.asarray(R21), np.asarray(t21),
                                 np.asarray(pts3d))

    def _create_initial_map(self, ref, frame, match_idx, inliers, R21, t21, pts3d):
        st = self.store
        ref.pose_cw = np.eye(4, dtype=np.float32)
        T2 = np.eye(4, dtype=np.float32)
        T2[:3, :3] = R21
        T2[:3, 3] = t21
        frame.pose_cw = T2

        # median-depth normalization (Tracking::CreateInitialMapMonocular)
        depths = pts3d[inliers][:, 2]
        med = float(np.median(depths)) if len(depths) else 1.0
        if med <= 0:
            return
        scale = 1.0 / med
        frame.pose_cw[:3, 3] *= scale
        pts3d = pts3d * scale

        k1 = self._insert_keyframe(ref)
        k2 = self._insert_keyframe(frame)
        for i in np.where(inliers)[0]:
            j = match_idx[i]
            mp = st.add_map_point(pts3d[i], frame.desc[j], ref_kf=k2)
            st.add_observation(mp, k1, int(i))
            st.add_observation(mp, k2, int(j))
            st.compute_distinctive_descriptor(mp)
            st.update_normal_and_depth(mp, self.scale_factor, self.n_levels)
            frame.mp[j] = mp
            ref.mp[i] = mp
        st.update_connections(k1)
        st.update_connections(k2)

        # full BA on the 2-view map (reference runs GBA(20))
        self._initial_ba(k1, k2)
        self.ref_kf = k2
        self.last_kf_frame_id = frame.frame_id
        self.state = TrackingState.OK
        _log.info(
            "map initialized: %d points", int(st.mp_alive[: st.n_mp].sum())
        )

    def _initial_ba(self, k1: int, k2: int):
        st = self.store
        mps = st.alive_mp_slots()
        if len(mps) < 10:
            return
        obs_cam, obs_pt, obs_uv, obs_is2 = [], [], [], []
        for local_i, m in enumerate(mps):
            for k, kp in st.obs[int(m)].items():
                obs_cam.append(0 if k == k1 else 1)
                obs_pt.append(local_i)
                obs_uv.append(st.kf_kp_uv[k, kp])
                obs_is2.append(1.0 / frame_sigma2(st, k, kp, self.scale_factor))
        prob = ba_ops.build_padded_problem(
            np.stack([st.kf_pose_cw[k1], st.kf_pose_cw[k2]]),
            np.stack([st.kf_K[k1], st.kf_K[k2]]),
            np.array([True, False]),
            st.mp_pos[mps], obs_cam, obs_pt, obs_uv, obs_is2,
        )
        res = ba_ops.bundle_adjust(prob, iters_a=10, iters_b=10, mode="dense")
        Tcw_np, pts_np = fetch(res.Tcw, res.pts)
        st.kf_pose_cw[k2] = np.asarray(Tcw_np)[1]
        st.mp_pos[mps] = np.asarray(pts_np)[: len(mps)]

    def _insert_keyframe(self, frame: Frame) -> int:
        st = self.store
        frame.compute_bow(self.vocab)
        k = st.add_keyframe(
            pose_cw=frame.pose_cw, K=frame.K,
            kp_uv=frame.xy, kp_octave=frame.octave, kp_angle=frame.angle,
            kp_response=frame.response, kp_valid=frame.valid, desc=frame.desc,
            ts=frame.timestamp, frame_id=frame.frame_id,
            velocity=self.mean_speed, hw=frame.hw,
        )
        st.kf_words[k, : len(frame.words)] = frame.words
        st.kf_nodes[k, : len(frame.nodes)] = frame.nodes
        kps = np.where(frame.mp != NO_MP)[0]
        st.add_observations_new_kf(k, kps, frame.mp[kps])
        self.kfdb.add(st, k)
        return k

    # ------------------------------------------------------------------ tracking
    def _track(self, frame: Frame):
        self._reanchor_last_frame()
        self.reacquire_subthreshold = False
        ok = False
        if self.state == TrackingState.OK:
            if self.velocity is not None:
                ok = self._track_with_motion_model(frame)
            if not ok:
                ok = self._track_reference_keyframe(frame)
        if self.state == TrackingState.LOST or not ok:
            ok = self._relocalize(frame)

        pose_acquired = ok  # a stage produced a pose; local-map ran fresh
        if ok:
            ok = self._track_local_map(frame)

        if (not ok and self.state == TrackingState.OK
                and self.grace < self.p.recently_lost_frames
                and self.velocity is not None
                and self.last_frame is not None
                and self.last_frame.pose_cw is not None):
            # RECENTLY_LOST re-acquisition: when the per-frame stages
            # fail, last_frame.mp has collapsed, so the motion model has
            # nothing to match against on the NEXT frame either — the
            # grace window would just dead-reckon into a death spiral
            # even while the camera is still over mapped terrain.
            # Window-match the reference keyframe neighborhood's points
            # around the predicted pose instead (wide window), then run
            # the normal local-map stage (reference: RECENTLY_LOST
            # re-enters TrackLocalMap once any stage produces a pose).
            if not pose_acquired or frame.pose_cw is None:
                frame.pose_cw = self.velocity @ self.last_frame.pose_cw
            ok = self._grace_reacquire(frame)
            if ok:
                _log.info("grace re-acquired tracking at frame %d: "
                          "inliers=%d", frame.frame_id, self.matches_inliers)

        if ok:
            self.state = TrackingState.OK
            self.lost_count = 0
            self.grace = 0
            if self.last_frame is not None and self.last_frame.pose_cw is not None:
                self.velocity = frame.pose_cw @ np.linalg.inv(self.last_frame.pose_cw)
            if self._need_new_keyframe(frame):
                self._create_new_keyframe(frame)
        else:
            if (self.state == TrackingState.OK
                    and self.grace < self.p.recently_lost_frames
                    and self.velocity is not None
                    and self.last_frame is not None
                    and self.last_frame.pose_cw is not None):
                # RECENTLY_LOST: hold the motion model for a short grace
                # window.  Every re-acquisition path (motion model,
                # reference-KF BoW, relocalization, local-map matching)
                # already ran this frame and keeps running on the next —
                # the only change is not nulling the pose / state.
                self.grace += 1
                has_pose = ((pose_acquired or self.reacquire_subthreshold)
                            and frame.pose_cw is not None
                            and self.matches_inliers >= 10)
                if not has_pose:
                    # no usable sub-threshold pose: dead-reckon
                    frame.pose_cw = self.velocity @ self.last_frame.pose_cw
                if self.grace == 1 or self.grace % 10 == 0:
                    _log.info(
                        "tracking RECENTLY_LOST (%d/%d) at frame %d: "
                        "inliers=%d — holding motion model",
                        self.grace, self.p.recently_lost_frames,
                        frame.frame_id, self.matches_inliers,
                    )
                # rescue keyframe: a sub-threshold pose with decent
                # support still extends the map — without it, no new
                # points get triangulated in the weak region, inliers
                # stay pinned below the threshold, and the grace window
                # just delays the death spiral (observed: 40 frames at
                # 17 inliers, then LOST for the rest of the circuit)
                if (has_pose
                        and self.matches_inliers >= self.p.kf_min_inliers
                        and self._need_new_keyframe(frame)):
                    self._create_new_keyframe(frame)
                return
            if self.state != TrackingState.LOST:
                st = self.store
                _log.warning(
                    "tracking LOST at frame %d: inliers=%d local_mps=%d "
                    "alive_kfs=%d had_velocity=%s",
                    frame.frame_id, self.matches_inliers,
                    int((frame.mp != NO_MP).sum()),
                    int(st.kf_alive[: st.n_kf].sum()),
                    self.velocity is not None,
                )
            self.state = TrackingState.LOST
            self.lost_count += 1
            self.velocity = None
            frame.pose_cw = None
            if self.store.kf_alive[: self.store.n_kf].sum() <= 5:
                _log.warning("lost right after init — resetting map")
                self.reset()

    def _match_against_mps(
        self, frame: Frame, mp_slots: np.ndarray, Tcw_guess: np.ndarray,
        window_th: float,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Project map points with a pose guess and window-match them to
        the frame keypoints.  Pads the slot set to a power-of-two bucket
        so the traced program compiles once per bucket.
        Returns (padded_slots, kp_idx per slot, valid per slot, visible)."""
        st = self.store
        slots, slot_ok = pad_slots(np.asarray(mp_slots, np.int32))
        pos = st.mp_pos[slots]
        uv, depth, visible = matching.project_to_frame(
            jnp.asarray(Tcw_guess), jnp.asarray(frame.K), jnp.asarray(pos), frame.hw
        )
        visible = visible & jnp.asarray(slot_ok)
        pred_oct = matching.predicted_octave(
            depth, jnp.asarray(st.mp_max_dist[slots]),
            self.scale_factor, self.n_levels,
        )
        radius = window_th * jnp.asarray(self.scale_factor) ** pred_oct.astype(jnp.float32)
        mask = matching.window_mask(
            uv, jnp.asarray(frame.xy), radius,
            visible, jnp.asarray(frame.valid),
            t_octave=jnp.asarray(frame.octave),
            oct_lo=pred_oct - 1, oct_hi=pred_oct + 1,
        )
        m = matching.masked_match(
            jnp.asarray(st.mp_desc[slots]), jnp.asarray(frame.desc), mask,
            max_dist=matching.TH_HIGH, ratio=0.0,
        )
        idx, valid, vis = fetch(m.idx, m.valid, visible)
        return slots, np.asarray(idx), np.asarray(valid), np.asarray(vis)

    def _pose_opt_frame(self, frame: Frame) -> int:
        """Run LM pose optimization on the frame's current associations;
        prune outlier associations. Returns inlier count.
        Always runs at the full (fixed) frame size — one compile total."""
        st = self.store
        slots = np.clip(frame.mp, 0, max(st.n_mp - 1, 0))
        valid = (frame.mp != NO_MP) & st.mp_alive[slots] & frame.valid
        if valid.sum() < 3:
            return 0
        res = pose_opt.pose_optimize_auto(
            jnp.asarray(frame.pose_cw), jnp.asarray(frame.K),
            jnp.asarray(st.mp_pos[slots]), jnp.asarray(frame.xy),
            jnp.asarray(1.0 / frame.sigma2),
            jnp.asarray(valid),
        )
        Tcw_np, inl = fetch(res.Tcw, res.inliers)
        frame.pose_cw = np.asarray(Tcw_np)
        inl = np.asarray(inl)
        if self.dynamic is not None and self.dynamic.extractor is None:
            # model-free fallback ONLY: rigid-motion outliers are dynamic
            # evidence, inliers static.  With an appearance segmenter
            # configured, appearance is the sole evidence source — the
            # per-frame residual vote's false-positive rate (transient
            # outliers under fast motion / marginal matches) otherwise
            # out-shouts the per-keyframe mask votes and flags swaths of
            # static map (observed: 691 of ~900 points flagged).
            self.dynamic.votes.vote(slots[valid], ~inl[valid])
        frame.mp[valid & ~inl] = NO_MP
        return int(inl.sum())

    def _track_with_motion_model(self, frame: Frame) -> bool:
        lf = self.last_frame
        if lf is None or lf.pose_cw is None:
            return False
        st = self.store
        frame.pose_cw = self.velocity @ lf.pose_cw
        has = (lf.mp != NO_MP)
        raw = lf.mp[has]
        raw = raw[st.mp_alive[raw]]
        if self.dynamic is not None and len(raw):
            raw = raw[self.dynamic.filter_static(raw)]
        if len(raw) < 10:
            return False
        slots, kp_idx, valid, _vis = self._match_against_mps(
            frame, raw, frame.pose_cw, self.p.motion_window_th
        )
        frame.mp[:] = NO_MP
        frame.mp[kp_idx[valid]] = slots[valid]
        if valid.sum() < 20:
            # widen the window once, as the reference does
            slots, kp_idx, valid, _vis = self._match_against_mps(
                frame, raw, frame.pose_cw, 2 * self.p.motion_window_th
            )
            frame.mp[:] = NO_MP
            frame.mp[kp_idx[valid]] = slots[valid]
        if valid.sum() < 20:
            return False
        return self._pose_opt_frame(frame) >= self.p.min_inliers_motion

    def _track_reference_keyframe(self, frame: Frame) -> bool:
        if self.ref_kf < 0:
            return False
        st = self.store
        frame.compute_bow(self.vocab)
        k = self.ref_kf
        node_m = matching.node_mask(
            jnp.asarray(st.kf_nodes[k]), jnp.asarray(frame.nodes),
            jnp.asarray(st.kf_kp_valid[k] & (st.kf_kp_mp[k] != NO_MP)),
            jnp.asarray(frame.valid),
        )
        m = matching.masked_match(
            jnp.asarray(st.kf_desc[k]), jnp.asarray(frame.desc), node_m,
            max_dist=matching.TH_LOW, ratio=0.7,
            angle_q=jnp.asarray(st.kf_kp_angle[k]), angle_t=jnp.asarray(frame.angle),
            check_rotation=True,
        )
        idx, valid = fetch(m.idx, m.valid)
        idx, valid = np.asarray(idx), np.asarray(valid)
        if valid.sum() < 15:
            return False
        frame.mp[:] = NO_MP
        kf_mps = st.kf_kp_mp[k]
        for kp_q in np.where(valid)[0]:
            mp = kf_mps[kp_q]
            if mp != NO_MP and st.mp_alive[mp]:
                frame.mp[idx[kp_q]] = mp
        frame.pose_cw = (
            self.last_frame.pose_cw.copy()
            if self.last_frame is not None and self.last_frame.pose_cw is not None
            else st.kf_pose_cw[k].copy()
        )
        return self._pose_opt_frame(frame) >= self.p.min_inliers_motion

    def _track_local_map(self, frame: Frame) -> bool:
        st = self.store
        # local keyframes: observers of current points + their neighbors
        cur = frame.mp[frame.mp != NO_MP]
        cur = np.unique(cur[st.mp_alive[cur]]).astype(np.int64)
        if not len(cur):
            return False
        in_cur = np.zeros(len(st.mp_alive), bool)
        in_cur[cur] = True
        om, okf, _ = st.obs_arrays()
        sel = in_cur[om] & st.kf_alive[okf]
        binc = np.bincount(okf[sel], minlength=st.n_kf)
        order = np.argsort(-binc, kind="stable")
        local_kfs = order[binc[order] > 0][:80].tolist()
        if not local_kfs:
            return False
        counts = {int(k): int(binc[k]) for k in local_kfs}
        self.ref_kf = int(local_kfs[0])
        for k in list(local_kfs[:10]):
            for k2 in st.covisible_kfs(int(k), 10):
                if k2 not in counts:
                    local_kfs.append(k2)
                    counts[k2] = 0
        # local points: union of local KFs' rows minus the current set
        rows = st.kf_kp_mp[np.asarray(local_kfs, np.int32)]
        flat = rows[rows != NO_MP]
        uniq, first = np.unique(flat, return_index=True)
        cand = uniq[np.argsort(first)]
        cand = cand[st.mp_alive[cand] & ~in_cur[cand]]
        local_mps = cand[: self.p.max_local_mps].tolist()
        if local_mps:
            slots, kp_idx, valid, vis = self._match_against_mps(
                frame, np.asarray(local_mps, np.int32),
                frame.pose_cw, self.p.local_window_th,
            )
            st.increase_visible(slots[vis], log=False)
            # only claim keypoints not already associated
            for qi in np.where(valid)[0]:
                if frame.mp[kp_idx[qi]] == NO_MP:
                    frame.mp[kp_idx[qi]] = slots[qi]
        n_inl = self._pose_opt_frame(frame)
        self.matches_inliers = n_inl
        tracked = frame.mp[frame.mp != NO_MP]
        st.increase_found(tracked, log=False)
        return n_inl >= self.p.min_inliers_local

    def _grace_reacquire(self, frame: Frame) -> bool:
        """RECENTLY_LOST recovery: match the reference keyframe
        neighborhood's map points around the predicted pose with a wide
        window, then run the normal local-map stage.  The per-frame
        stages can't do this themselves once last_frame.mp collapses
        (motion model) and the view drifts from the reference keyframe
        (BoW): this is the monocular equivalent of the reference's
        RECENTLY_LOST hold-and-retry (Tracking.cc state machine)."""
        if self.ref_kf < 0 or frame.pose_cw is None:
            return False
        st = self.store
        ks = [self.ref_kf] + st.covisible_kfs(self.ref_kf, 7)
        rows = st.kf_kp_mp[np.asarray(ks, np.int32)]
        raw = np.unique(rows[rows != NO_MP])
        raw = raw[st.mp_alive[raw]]
        if len(raw) < 20:
            return False
        # the attempt mutates frame.mp / frame.pose_cw; on an EARLY
        # failure (too few matches / pose opt diverged) the RECENTLY_LOST
        # branch may still insert a rescue keyframe keyed to the earlier
        # stage's matches_inliers, so those associations must survive
        # (ADVICE r4).  A LATE failure — local map tracked but below the
        # acceptance bar — leaves frame.mp/pose/matches_inliers mutually
        # CONSISTENT, and keeping them is what lets the rescue-keyframe
        # path extend the map through a weak-feature section (observed:
        # 20 frames dead-reckoning at 23 inliers with the map frozen,
        # then a late relocalization that misses the loop-closure window).
        saved_mp = frame.mp.copy()
        saved_pose = None if frame.pose_cw is None else frame.pose_cw.copy()
        saved_inliers = self.matches_inliers
        self.reacquire_subthreshold = False

        def fail() -> bool:
            frame.mp[:] = saved_mp
            frame.pose_cw = saved_pose
            self.matches_inliers = saved_inliers
            return False

        slots, kp_idx, valid, _vis = self._match_against_mps(
            frame, raw.astype(np.int32), frame.pose_cw,
            3 * self.p.motion_window_th,
        )
        if valid.sum() < 20:
            return fail()
        frame.mp[:] = NO_MP
        frame.mp[kp_idx[valid]] = slots[valid]
        if self._pose_opt_frame(frame) < self.p.min_inliers_motion:
            return fail()
        if not self._track_local_map(frame):
            if self.matches_inliers >= self.p.kf_min_inliers:
                # sub-threshold but self-consistent pose + associations:
                # keep them so the grace branch can rescue-keyframe
                self.reacquire_subthreshold = True
                return False
            return fail()
        return True

    def _relocalize(self, frame: Frame) -> bool:
        st = self.store
        frame.compute_bow(self.vocab)
        candidates = self.kfdb.detect_reloc_candidates(frame, st)
        cands = [int(k) for k in candidates[:5]]
        if not cands:
            return False
        # ONE dispatch + fetch for ALL candidates' BoW matching (a lost
        # agent relocalizes every frame; per-candidate round trips cost
        # up to 10 RPCs/frame through the tunnel).  Pad to a fixed bank
        # of 5 so the vmapped program compiles once.
        B = 5
        nodes_b = np.zeros((B,) + st.kf_nodes[cands[0]].shape, np.int32)
        desc_b = np.zeros((B,) + st.kf_desc[cands[0]].shape, np.uint32)
        qval_b = np.zeros((B, len(st.kf_kp_valid[cands[0]])), bool)
        for bi, k in enumerate(cands):
            nodes_b[bi] = st.kf_nodes[k]
            desc_b[bi] = st.kf_desc[k]
            qval_b[bi] = st.kf_kp_valid[k] & (st.kf_kp_mp[k] != NO_MP)
        m = _batched_bow_match(
            jnp.asarray(nodes_b), jnp.asarray(qval_b), jnp.asarray(desc_b),
            jnp.asarray(frame.nodes), jnp.asarray(frame.valid),
            jnp.asarray(frame.desc),
        )
        idx_b, valid_b = (np.asarray(x) for x in fetch(m.idx, m.valid))
        for bi, k in enumerate(cands):
            idx, valid = idx_b[bi], valid_b[bi]
            if valid.sum() < 15:
                continue
            # gather 3D-2D correspondences
            pts, uvs = [], []
            for kp_q in np.where(valid)[0]:
                mp = st.kf_kp_mp[k, kp_q]
                if mp != NO_MP and st.mp_alive[mp]:
                    pts.append(st.mp_pos[mp])
                    uvs.append(frame.xy[idx[kp_q]])
            if len(pts) < 10:
                continue
            b = bucket_size(len(pts), 256)
            pts_p = pad_rows(np.array(pts, np.float32), b)
            uvs_p = pad_rows(np.array(uvs, np.float32), b)
            ok_p = np.zeros(b, bool)
            ok_p[: len(pts)] = True
            res = pnp.ransac_pnp(
                jnp.asarray(pts_p), jnp.asarray(uvs_p),
                jnp.asarray(ok_p), jnp.asarray(frame.K),
                self._split_key(), min_inliers=self.p.min_inliers_reloc,
            )
            ok_r, Tcw_r = fetch(res.success, res.Tcw)
            if bool(ok_r):
                frame.pose_cw = np.asarray(Tcw_r)
                frame.mp[:] = NO_MP
                kf_mps = st.kf_kp_mp[k]
                for kp_q in np.where(valid)[0]:
                    mp = kf_mps[kp_q]
                    if mp != NO_MP and st.mp_alive[mp]:
                        frame.mp[idx[kp_q]] = mp
                if self._pose_opt_frame(frame) >= self.p.min_inliers_reloc:
                    self.ref_kf = k
                    _log.info("relocalized against kf %d", k)
                    return True
        return False

    # ------------------------------------------------------------ keyframe policy
    def _need_new_keyframe(self, frame: Frame) -> bool:
        st = self.store
        if self.ref_kf < 0:
            return False
        # reference: nMinObs = 3 if nKFs > 2 else 2 (Tracking::NeedNewKeyFrame)
        min_obs = 3 if st.kf_alive[: st.n_kf].sum() > 2 else 2
        ref_matches = st.kf_tracked_points(self.ref_kf, min_obs=min_obs)
        max_frames = self.settings.camera.fps
        since = frame.frame_id - self.last_kf_frame_id
        c1 = since >= max_frames
        c2 = (
            self.matches_inliers < self.p.kf_ref_ratio * max(ref_matches, 1)
            and self.matches_inliers > self.p.kf_min_inliers
        )
        # synchronous mapping has no "mapping busy" back-pressure (the
        # reference throttles insertion when LocalMapping is occupied,
        # Tracking::NeedNewKeyFrame); emulate it with a minimum gap that
        # yields when the view is changing fast (tracked support dropping)
        min_gap = max(int(0.2 * max_frames), 2)
        urgent = self.matches_inliers < 0.75 * max(ref_matches, 1)
        # reference: bLocalMappingIdle gates the non-urgent branch — a
        # busy mapping worker throttles keyframe creation instead of
        # growing an unbounded queue (Tracking::NeedNewKeyFrame)
        if (not urgent and self.local_mapping is not None
                and getattr(self.local_mapping, "busy", False)):
            return False
        return (c1 or since >= min_gap or urgent) and c2

    def _create_new_keyframe(self, frame: Frame):
        from ..utils.stats import STATS

        with STATS.stage("kf_insert"):
            frame.ensure_features()
            k = self._insert_keyframe(frame)
        # stereo/RGB-D: seed map points directly from depth for unmatched
        # keypoints, closest first (reference: Tracking::CreateNewKeyFrame)
        if frame.kp_depth is not None:
            st = self.store
            free = frame.valid & (frame.kp_depth > 0) & (frame.mp == NO_MP)
            idx = np.where(free)[0]
            order = np.argsort(frame.kp_depth[idx])[:300]
            sel = idx[order]
            if len(sel):
                pts = self._backproject(frame, sel)
                seeded = []
                for i, kp in enumerate(sel):
                    mp = st.add_map_point(pts[i], frame.desc[kp], ref_kf=k)
                    st.add_observation(mp, k, int(kp))
                    frame.mp[kp] = mp
                    seeded.append(mp)
                    if self.local_mapping is not None:
                        self.local_mapping.recent_mps.append(mp)
                st.refresh_points(seeded, self.scale_factor, self.n_levels,
                                  descriptors=False)
                st.update_connections(k)
        self.last_kf_frame_id = frame.frame_id
        self.ref_kf = k
        if self.local_mapping is not None:
            self.local_mapping.insert_keyframe(k)

    # ------------------------------------------------------------------ STS
    def _update_velocity_stats(self, center: np.ndarray):
        """Sliding-window mean speed + burst flag
        (reference: Tracking::UpdateAverageVelocity, Tracking.cc:1364)."""
        self.centers.append(center.copy())
        if len(self.centers) < 3:
            return
        steps = [
            float(np.linalg.norm(self.centers[i + 1] - self.centers[i]))
            for i in range(len(self.centers) - 1)
        ]
        self.mean_speed = float(np.mean(steps))
        self.velocity_burst = steps[-1] > self.p.burst_factor * max(self.mean_speed, 1e-9)

    def system_state(self) -> SystemState:
        loc = (
            self.trajectory[-1][1][:3, 3]
            if self.trajectory
            else np.zeros(3, np.float32)
        )
        return SystemState(
            location=loc,
            velocity_burst=self.velocity_burst,
            stable=self.state == TrackingState.OK,
            n_tracked=self.matches_inliers,
            lost_count=self.lost_count,
        )

    def reset(self):
        st = self.store
        st.__init__(map_id=st.map_id, n_kp=st.n_kp, log_fn=st.log_fn)
        self.kfdb.__init__(self.vocab)
        self.state = TrackingState.NOT_INITIALIZED
        self.init_frame = None
        self.velocity = None
        self.ref_kf = -1
        self.grace = 0
        if self.store.log_fn is not None:
            self.store.log_fn("map", "clear", self.store.map_id, ())


def frame_sigma2(st: MapStore, k: int, kp: int, scale: float) -> float:
    return float(scale ** (2 * st.kf_kp_octave[k, kp]))
