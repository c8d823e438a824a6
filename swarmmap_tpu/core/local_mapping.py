"""Local mapping: map growth + refinement around each new keyframe.

Reference spec: LocalMapping (/root/reference/code/src/LocalMapping.cc) —
ProcessNewKeyFrame -> MapPointCulling -> CreateNewMapPoints (epipolar
triangulation with covisible neighbors) -> SearchInNeighbors (fuse) ->
LocalBundleAdjustment -> KeyFrameCulling.  The SwarmMap twist: instead of
feeding a local loop closer, it emits an AddLoopClosing map event so the
SERVER's loop closer picks the keyframe up (LocalMapping.cc:88-90).

Runs synchronously here (one call per inserted keyframe) — determinism
over thread soup; the pipeline parallelism of the reference's free-running
thread comes back at the system level where extraction of frame t+1
overlaps mapping of frame t on device vs host.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import ba as ba_ops
from ..ops import matching, triangulate as tri
from ..utils.logging import get_logger
from ..utils.padding import pad_slots
from .map_store import NO_MP, MapStore

_log = get_logger("mapping")


class LocalMapping:
    def __init__(self, store: MapStore, settings, kfdb=None, on_loop_closing=None):
        self.store = store
        self.settings = settings
        self.kfdb = kfdb
        self.on_loop_closing = on_loop_closing  # server-side loop-closer hook
        self.recent_mps: list[int] = []
        self.queue: list[int] = []

    @property
    def scale_factor(self):
        return self.settings.orb.scale_factor

    @property
    def n_levels(self):
        return self.settings.orb.n_levels

    def insert_keyframe(self, k: int):
        self.queue.append(k)
        self.process_queue()

    def process_queue(self):
        while self.queue:
            k = self.queue.pop(0)
            self.process_keyframe(k)

    def process_keyframe(self, k: int):
        st = self.store
        self._process_new_keyframe(k)
        self._cull_map_points(k)
        self._create_new_map_points(k)
        self._fuse_neighbors(k)
        if st.kf_alive[: st.n_kf].sum() > 2:
            self._local_ba(k)
        self._cull_keyframes(k)
        # hand the KF to the (server-side) loop closer via the map event
        # log (reference: LocalMapping.cc:88-90)
        if st.log_fn is not None:
            st.log_fn("map", "AddLoopClosing", int(st.kf_gid[k]), ())
        if self.on_loop_closing is not None:
            self.on_loop_closing(k)

    # ------------------------------------------------------------------
    def _process_new_keyframe(self, k: int):
        st = self.store
        for kp, m in enumerate(st.kf_kp_mp[k]):
            if m != NO_MP and st.mp_alive[m]:
                st.compute_distinctive_descriptor(int(m))
                st.update_normal_and_depth(int(m), self.scale_factor, self.n_levels)
        st.update_connections(k)

    def _cull_map_points(self, k: int):
        """Recent-point quality gate (reference: MapPointCulling)."""
        st = self.store
        kept = []
        for m in self.recent_mps:
            if not st.mp_alive[m]:
                continue
            found_ratio = st.mp_found[m] / max(st.mp_visible[m], 1)
            age = k - st.mp_first_kf[m]
            n_obs = len(st.obs.get(m, {}))
            if found_ratio < 0.25:
                st.set_mp_bad(m)
            elif age >= 2 and n_obs <= 2:
                st.set_mp_bad(m)
            elif age >= 3:
                continue  # graduated
            else:
                kept.append(m)
        self.recent_mps = kept

    def _create_new_map_points(self, k: int, n_neighbors: int = 10):
        st = self.store
        neighbors = st.covisible_kfs(k, n_neighbors)
        K1 = st.kf_K[k]
        T1 = st.kf_pose_cw[k]
        P1 = (K1 @ T1[:3]).astype(np.float32)
        c1 = st.kf_center(k)
        created = 0
        for k2 in neighbors:
            c2 = st.kf_center(k2)
            baseline = np.linalg.norm(c2 - c1)
            # skip tiny baselines relative to scene depth
            mps2 = st.kf_kp_mp[k2]
            live = mps2[(mps2 != NO_MP)]
            live = live[st.mp_alive[live]]
            if len(live):
                depths = (st.mp_pos[live] @ st.kf_pose_cw[k2][:3, :3].T
                          + st.kf_pose_cw[k2][:3, 3])[:, 2]
                med_depth = float(np.median(depths[depths > 0])) if (depths > 0).any() else 1.0
            else:
                med_depth = 1.0
            if baseline / max(med_depth, 1e-9) < 0.01:
                continue
            # fundamental matrix F12 between the two keyframes
            T2 = st.kf_pose_cw[k2]
            T12 = T1 @ np.linalg.inv(T2)
            R12, t12 = T12[:3, :3], T12[:3, 3]
            tx = np.array(
                [[0, -t12[2], t12[1]], [t12[2], 0, -t12[0]], [-t12[1], t12[0], 0]],
                np.float32,
            )
            K2 = st.kf_K[k2]
            F12 = np.linalg.inv(K1).T @ tx @ R12 @ np.linalg.inv(K2)

            free1 = st.kf_kp_valid[k] & (st.kf_kp_mp[k] == NO_MP)
            free2 = st.kf_kp_valid[k2] & (st.kf_kp_mp[k2] == NO_MP)
            sig2_2 = self.scale_factor ** (2.0 * st.kf_kp_octave[k2])
            mask = matching.node_mask(
                jnp.asarray(st.kf_nodes[k]), jnp.asarray(st.kf_nodes[k2]),
                jnp.asarray(free1), jnp.asarray(free2),
            ) & matching.epipolar_mask(
                jnp.asarray(st.kf_kp_uv[k]), jnp.asarray(st.kf_kp_uv[k2]),
                jnp.asarray(F12), jnp.asarray(sig2_2, jnp.float32),
                jnp.asarray(free1), jnp.asarray(free2),
            )
            m = matching.masked_match(
                jnp.asarray(st.kf_desc[k]), jnp.asarray(st.kf_desc[k2]), mask,
                max_dist=matching.TH_LOW, ratio=0.0,
                angle_q=jnp.asarray(st.kf_kp_angle[k]),
                angle_t=jnp.asarray(st.kf_kp_angle[k2]),
                check_rotation=True,
            )
            idx = np.asarray(m.idx)
            valid = np.asarray(m.valid)
            if not valid.any():
                continue
            # batched triangulation of all matches
            P2 = (K2 @ T2[:3]).astype(np.float32)
            uv1 = st.kf_kp_uv[k]
            uv2 = st.kf_kp_uv[k2][idx]
            pts = np.asarray(
                tri.triangulate(jnp.asarray(P1), jnp.asarray(P2),
                                jnp.asarray(uv1), jnp.asarray(uv2))
            )
            z1 = (pts @ T1[:3, :3].T + T1[:3, 3])[:, 2]
            z2 = (pts @ T2[:3, :3].T + T2[:3, 3])[:, 2]
            e1 = np.asarray(tri.reprojection_error2(jnp.asarray(P1), jnp.asarray(pts), jnp.asarray(uv1)))
            e2 = np.asarray(tri.reprojection_error2(jnp.asarray(P2), jnp.asarray(pts), jnp.asarray(uv2)))
            cosp = np.asarray(tri.parallax_cos(jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(pts)))
            sig2_1 = self.scale_factor ** (2.0 * st.kf_kp_octave[k])
            good = (
                valid & np.isfinite(pts).all(1)
                & (z1 > 0) & (z2 > 0)
                & (e1 < 5.991 * sig2_1) & (e2 < 5.991 * sig2_2[idx])
                & (cosp < 0.9998)
            )
            for i in np.where(good)[0]:
                j = int(idx[i])
                mp = st.add_map_point(
                    pts[i], st.kf_desc[k, i], ref_kf=k,
                    cam_velocity=float(st.kf_velocity[k]),
                )
                st.add_observation(mp, k, int(i))
                st.add_observation(mp, k2, j)
                st.compute_distinctive_descriptor(mp)
                st.update_normal_and_depth(mp, self.scale_factor, self.n_levels)
                self.recent_mps.append(mp)
                created += 1
        if created:
            st.update_connections(k)

    def _fuse_neighbors(self, k: int, window_th: float = 3.0):
        """Project each neighbor's points into k (and vice versa), merge
        duplicates (reference: SearchInNeighbors + ORBmatcher::Fuse)."""
        st = self.store
        neighbors = st.covisible_kfs(k, 10)
        targets = [k] + neighbors
        for tk in targets:
            # collect candidate points from the other side
            sources = neighbors if tk == k else [k]
            cand = set()
            for sk in sources:
                for m in st.kf_kp_mp[sk]:
                    if m != NO_MP and st.mp_alive[m]:
                        cand.add(int(m))
            if not cand:
                continue
            slots = np.asarray(sorted(cand), np.int32)
            self._fuse_into_kf(tk, slots, window_th)
        for kp, m in enumerate(st.kf_kp_mp[k]):
            if m != NO_MP and st.mp_alive[m]:
                st.compute_distinctive_descriptor(int(m))
                st.update_normal_and_depth(int(m), self.scale_factor, self.n_levels)
        st.update_connections(k)

    def _fuse_into_kf(self, k: int, slots: np.ndarray, window_th: float):
        st = self.store
        slots, slot_ok = pad_slots(np.asarray(slots, np.int32))
        Tcw = st.kf_pose_cw[k]
        hw = tuple(int(x) for x in st.kf_hw[k])
        uv, depth, visible = matching.project_to_frame(
            jnp.asarray(Tcw), jnp.asarray(st.kf_K[k]),
            jnp.asarray(st.mp_pos[slots]), hw,
        )
        visible = visible & jnp.asarray(slot_ok)
        pred_oct = matching.predicted_octave(
            depth, jnp.asarray(st.mp_max_dist[slots]), self.scale_factor, self.n_levels
        )
        radius = window_th * jnp.asarray(self.scale_factor) ** pred_oct.astype(jnp.float32)
        mask = matching.window_mask(
            uv, jnp.asarray(st.kf_kp_uv[k]), radius,
            visible, jnp.asarray(st.kf_kp_valid[k]),
            t_octave=jnp.asarray(st.kf_kp_octave[k]),
            oct_lo=pred_oct - 1, oct_hi=pred_oct + 1,
        )
        m = matching.masked_match(
            jnp.asarray(st.mp_desc[slots]), jnp.asarray(st.kf_desc[k]), mask,
            max_dist=matching.TH_LOW, ratio=0.0,
        )
        idx = np.asarray(m.idx)
        valid = np.asarray(m.valid)
        for qi in np.where(valid)[0]:
            mp_new = int(slots[qi])
            kp = int(idx[qi])
            mp_old = int(st.kf_kp_mp[k, kp])
            if not st.mp_alive[mp_new]:
                continue
            if mp_old != NO_MP and st.mp_alive[mp_old]:
                if mp_old == mp_new:
                    continue
                # keep the better-observed point
                if len(st.obs.get(mp_old, {})) >= len(st.obs.get(mp_new, {})):
                    st.replace_mp(mp_new, mp_old)
                else:
                    st.replace_mp(mp_old, mp_new)
            else:
                st.add_observation(mp_new, k, kp)

    # ------------------------------------------------------------------
    def _local_ba(self, k: int, max_cams: int = 16, max_pts: int = 4096,
                  max_obs: int = 16384):
        """Covisibility-window bundle adjustment
        (reference: Optimizer::LocalBundleAdjustment)."""
        st = self.store
        local = [k] + st.covisible_kfs(k, max_cams - 1)
        local_set = set(local)
        # local points = union of local KFs' observations
        pts = []
        pt_index: dict[int, int] = {}
        for lk in local:
            for m in st.kf_kp_mp[lk]:
                mi = int(m)
                if mi != NO_MP and st.mp_alive[mi] and mi not in pt_index:
                    pt_index[mi] = len(pts)
                    pts.append(mi)
                    if len(pts) >= max_pts:
                        break
        if len(pts) < 20:
            return
        # frontier: KFs observing local points but not in the window (fixed)
        frontier = []
        for m in pts:
            for ok in st.obs.get(m, {}):
                if ok not in local_set and st.kf_alive[ok]:
                    frontier.append(ok)
                    local_set.add(ok)
        cams = local + frontier
        cam_index = {c: i for i, c in enumerate(cams)}
        fixed = np.zeros(len(cams), bool)
        fixed[len(local):] = True
        if 0 in cam_index:
            fixed[cam_index[0]] = True  # keep the origin KF as gauge
        elif not fixed.any():
            fixed[len(local) - 1] = True  # no frontier: anchor the oldest
        obs_cam, obs_pt, obs_uv, obs_is2 = [], [], [], []
        for m in pts:
            for kfk, kp in st.obs.get(m, {}).items():
                if kfk in cam_index and st.kf_alive[kfk]:
                    obs_cam.append(cam_index[kfk])
                    obs_pt.append(pt_index[m])
                    obs_uv.append(st.kf_kp_uv[kfk, kp])
                    obs_is2.append(
                        1.0 / self.scale_factor ** (2.0 * st.kf_kp_octave[kfk, kp])
                    )
                    if len(obs_cam) >= max_obs:
                        break
        if len(obs_cam) < 30:
            return
        prob = ba_ops.build_padded_problem(
            st.kf_pose_cw[cams], st.kf_K[cams], fixed,
            st.mp_pos[pts], obs_cam, obs_pt, obs_uv, obs_is2,
        )
        res = ba_ops.bundle_adjust(prob, iters_a=5, iters_b=10, mode="dense")
        Tcw_new = np.asarray(res.Tcw)
        pts_new = np.asarray(res.pts)
        for i, c in enumerate(cams):
            if not fixed[i]:
                st.set_kf_pose(c, Tcw_new[i])
        for m, i in pt_index.items():
            st.set_mp_pos(m, pts_new[i])
        # prune outlier observations (ignore padded tail)
        inl = np.asarray(res.obs_inlier)[: len(obs_cam)]
        for o in np.where(~inl)[0]:
            m = pts[obs_pt[o]]
            c = cams[obs_cam[o]]
            st.erase_observation(m, c)

    def _cull_keyframes(self, k: int):
        """Redundancy culling: a local KF whose points are >=90% seen by
        at least 3 other KFs at the same/finer scale dies
        (reference: LocalMapping::KeyFrameCulling, ratio 0.9)."""
        st = self.store
        for lk in st.covisible_kfs(k):
            if lk == 0 or not st.kf_alive[lk] or not st.kf_genuine[lk]:
                continue
            mps = st.kf_kp_mp[lk]
            total = 0
            redundant = 0
            for kp, m in enumerate(mps):
                mi = int(m)
                if mi == NO_MP or not st.mp_alive[mi]:
                    continue
                total += 1
                scale_lvl = st.kf_kp_octave[lk, kp]
                n_better = 0
                for ok, okp in st.obs.get(mi, {}).items():
                    if ok != lk and st.kf_alive[ok] and st.kf_kp_octave[ok, okp] <= scale_lvl + 1:
                        n_better += 1
                        if n_better >= 3:
                            break
                if n_better >= 3:
                    redundant += 1
            if total > 10 and redundant > 0.9 * total:
                if self.kfdb is not None:
                    self.kfdb.erase(lk)
                st.set_kf_bad(lk)
                _log.debug("culled redundant keyframe %d", lk)
