"""Loop detection + correction (server-side).

Reference spec: LoopClosing (/root/reference/code/src/LoopClosing.cc) —
BoW candidate detection with covisibility-consistency (>=3 consecutive),
Sim3 computation (SearchByBoW >=20 matches -> Sim3 RANSAC -> OptimizeSim3
>=20 inliers), loop correction via essential-graph optimization +
SearchAndFuse, optional global BA.  On clients the thread never starts
(System.cc:96-97); each server mediator runs one per replica
(AgentMediator.cc:50-51).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.keyframe_db import KeyFrameDatabase
from ..core.map_store import NO_MP, MapStore
from ..ops import matching, pose_graph, sim3 as sim3_ops, sim3_opt
from ..ops import ba as ba_ops
from ..ops.vocab import Vocabulary
from ..utils.device import fetch
from ..utils.logging import get_logger
from ..utils.padding import pad_rows, bucket_size

_log = get_logger("loop")


class LoopClosing:
    def __init__(self, store: MapStore, kfdb: KeyFrameDatabase,
                 scale_factor: float = 1.2, n_levels: int = 8,
                 consistency_th: int = 3, min_sim3_inliers: int = 20,
                 run_global_ba: bool = True, rng_seed: int = 17,
                 on_merge=None):
        self.store = store
        self.kfdb = kfdb
        self.scale_factor = scale_factor
        self.n_levels = n_levels
        self.consistency_th = consistency_th
        self.min_sim3_inliers = min_sim3_inliers
        self.run_global_ba = run_global_ba
        self.on_merge = on_merge
        self._key = jax.random.PRNGKey(rng_seed)
        self.consistency: dict[int, int] = {}
        self.last_loop_kf = -1
        self.n_loops_closed = 0

    def _split_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # ------------------------------------------------------------------
    def process_keyframe(self, k: int) -> bool:
        st = self.store
        if not st.kf_alive[k]:
            return False
        if self.last_loop_kf >= 0 and k - self.last_loop_kf < 10:
            return False  # cooldown (reference: mLastLoopKFid + 10)
        cands = self.detect_loop(k)
        for cand in cands:
            res = self.compute_sim3(k, cand)
            if res is None:
                continue
            s, R, t, mp_pairs = res
            self.correct_loop(k, cand, s, R, t)
            self.last_loop_kf = k
            self.n_loops_closed += 1
            return True
        return False

    # ------------------------------------------------------------------
    def detect_loop(self, k: int) -> list[int]:
        """BoW candidates above the min covisible score, with the
        consecutive-consistency counter (reference: DetectLoop)."""
        st = self.store
        covis = st.covisible_kfs(k, 30)
        if len(covis) < 3:
            return []
        bow_k = self.kfdb.bow.get(k, {})
        min_score = min(
            (Vocabulary.score(bow_k, self.kfdb.bow.get(c, {})) for c in covis),
            default=0.0,
        )
        cands = self.kfdb.detect_loop_candidates(st, k, min_score)
        # temporal consistency: candidate groups must persist across
        # consecutive keyframes
        new_consistency: dict[int, int] = {}
        accepted = []
        for c in cands:
            group = set(st.covisible_kfs(c, 10)) | {c}
            prev = max((self.consistency.get(g, 0) for g in group), default=0)
            new_consistency[c] = prev + 1
            if prev + 1 >= self.consistency_th:
                accepted.append(c)
        self.consistency = new_consistency
        return accepted

    # ------------------------------------------------------------------
    def compute_sim3(self, k: int, cand: int):
        """Sim3 between current KF and candidate via matched map points
        (reference: ComputeSim3)."""
        st = self.store
        node_m = matching.node_mask(
            jnp.asarray(st.kf_nodes[k]), jnp.asarray(st.kf_nodes[cand]),
            jnp.asarray(st.kf_kp_valid[k] & (st.kf_kp_mp[k] != NO_MP)),
            jnp.asarray(st.kf_kp_valid[cand] & (st.kf_kp_mp[cand] != NO_MP)),
        )
        m = matching.masked_match(
            jnp.asarray(st.kf_desc[k]), jnp.asarray(st.kf_desc[cand]), node_m,
            max_dist=matching.TH_LOW, ratio=0.75,
        )
        idx, valid = fetch(m.idx, m.valid)
        idx, valid = np.asarray(idx), np.asarray(valid)
        if valid.sum() < 20:
            return None
        # matched map point pairs in each camera frame
        kq = np.where(valid)[0]
        mp1 = st.kf_kp_mp[k, kq]
        mp2 = st.kf_kp_mp[cand, idx[kq]]
        ok = (mp1 != NO_MP) & (mp2 != NO_MP) & st.mp_alive[mp1] & st.mp_alive[mp2]
        mp1, mp2, kq = mp1[ok], mp2[ok], kq[ok]
        if len(mp1) < 20:
            return None
        T1, T2 = st.kf_pose_cw[k], st.kf_pose_cw[cand]
        pc1 = st.mp_pos[mp1] @ T1[:3, :3].T + T1[:3, 3]
        pc2 = st.mp_pos[mp2] @ T2[:3, :3].T + T2[:3, 3]
        b = bucket_size(len(pc1), 128)
        okp = np.zeros(b, bool)
        okp[: len(pc1)] = True
        res = sim3_ops.ransac_sim3(
            jnp.asarray(pad_rows(pc1.astype(np.float32), b)),
            jnp.asarray(pad_rows(pc2.astype(np.float32), b)),
            jnp.asarray(okp),
            jnp.asarray(st.kf_K[k]), jnp.asarray(st.kf_K[cand]),
            self._split_key(), min_inliers=self.min_sim3_inliers,
        )
        r_ok, r_s, r_R, r_t = fetch(res.success, res.s, res.R, res.t)
        if not bool(r_ok):
            return None
        # refine with the Sim3 optimizer (reference: OptimizeSim3)
        uv1 = st.kf_kp_uv[k][kq]
        uv2 = st.kf_kp_uv[cand][np.asarray(idx)[kq]]
        is2_1 = 1.0 / self.scale_factor ** (2.0 * st.kf_kp_octave[k][kq])
        is2_2 = 1.0 / self.scale_factor ** (2.0 * st.kf_kp_octave[cand][np.asarray(idx)[kq]])
        opt = sim3_opt.optimize_sim3(
            jnp.asarray(r_s), jnp.asarray(r_R), jnp.asarray(r_t),
            jnp.asarray(pad_rows(pc1.astype(np.float32), b)),
            jnp.asarray(pad_rows(pc2.astype(np.float32), b)),
            jnp.asarray(pad_rows(uv1.astype(np.float32), b)),
            jnp.asarray(pad_rows(uv2.astype(np.float32), b)),
            jnp.asarray(pad_rows(is2_1.astype(np.float32), b)),
            jnp.asarray(pad_rows(is2_2.astype(np.float32), b)),
            jnp.asarray(okp), jnp.asarray(st.kf_K[k]), jnp.asarray(st.kf_K[cand]),
        )
        o_n, o_s, o_R, o_t = fetch(opt.n_inliers, opt.s, opt.R, opt.t)
        if int(o_n) < self.min_sim3_inliers:
            return None
        return float(o_s), np.asarray(o_R), np.asarray(o_t), (mp1, mp2)

    # ------------------------------------------------------------------
    def correct_loop(self, k: int, loop_kf: int, s: float, R: np.ndarray,
                     t: np.ndarray):
        """Essential-graph correction (reference: CorrectLoop).

        (s,R,t) = S_{k<-loop}: maps loop-KF camera coords into current-KF
        camera coords.  The corrected pose of k is S_k_loop * T_loop_w."""
        st = self.store
        slots = st.alive_kf_slots()
        n = len(slots)
        slot_of = {int(kk): i for i, kk in enumerate(slots)}
        Riw = st.kf_pose_cw[slots][:, :3, :3].astype(np.float32)
        tiw = st.kf_pose_cw[slots][:, :3, 3].astype(np.float32)
        siw = np.ones(n, np.float32)

        # corrected Sim3 for current KF:  S_kw_corr = S_k_loop * T_loop_w
        T_lw = st.kf_pose_cw[loop_kf]
        R_corr = (R @ T_lw[:3, :3]).astype(np.float32)
        t_corr = (s * (R @ T_lw[:3, 3]) + t).astype(np.float32)
        s_corr = np.float32(s)
        ik = slot_of[k]
        # propagate correction to current KF's covisible neighborhood:
        # S_iw_corr = S_i_k(old relative) * S_kw_corr
        neighborhood = [k] + st.covisible_kfs(k, 20)
        T_kw = st.kf_pose_cw[k]
        T_wk = np.linalg.inv(T_kw)
        for nk in neighborhood:
            i = slot_of.get(nk)
            if i is None:
                continue
            T_ik = st.kf_pose_cw[nk] @ T_wk
            # Sim3 composition: (R_ik, t_ik, 1) * (R_corr, t_corr, s_corr)
            Riw[i] = (T_ik[:3, :3] @ R_corr).astype(np.float32)
            tiw[i] = (T_ik[:3, :3] @ t_corr + T_ik[:3, 3]).astype(np.float32)
            siw[i] = s_corr

        # edges: spanning tree + strong covisibility + the new loop edge
        ei, ej, mR, mt, ms = [], [], [], [], []

        def add_edge(a, b, Sji=None):
            ia, ib = slot_of.get(a), slot_of.get(b)
            if ia is None or ib is None or ia == ib:
                return
            if Sji is None:
                # measurement from PRE-correction relative pose: S_ji = T_jw * T_iw^-1
                Tj = st.kf_pose_cw[b]
                Ti = st.kf_pose_cw[a]
                Tji = Tj @ np.linalg.inv(Ti)
                Sji = (Tji[:3, :3], Tji[:3, 3], 1.0)
            ei.append(ia)
            ej.append(ib)
            mR.append(np.asarray(Sji[0], np.float32))
            mt.append(np.asarray(Sji[1], np.float32))
            ms.append(float(Sji[2]))

        seen = set()
        for kk in slots:
            p = st.kf_parent[kk]
            if p >= 0 and st.kf_alive[p]:
                add_edge(int(kk), int(p))
            for k2, w in st.covis.get(int(kk), {}).items():
                if w >= 100 and st.kf_alive[k2] and (k2, int(kk)) not in seen:
                    seen.add((int(kk), k2))
                    add_edge(int(kk), k2)
            for k2 in st.kf_loop_edges.get(int(kk), ()):
                if st.kf_alive[k2] and (k2, int(kk)) not in seen:
                    seen.add((int(kk), k2))
                    add_edge(int(kk), k2)
        # the new loop edge with the measured Sim3 (S_k_loop)
        add_edge(loop_kf, k, (R, t, s))
        if len(ei) < n - 1:
            # ensure connectivity through temporal chain
            for i in range(n - 1):
                add_edge(int(slots[i]), int(slots[i + 1]))

        fixed = np.zeros(n, bool)
        fixed[slot_of[loop_kf]] = True
        nodes = pose_graph.optimize_pose_graph(
            pose_graph.Sim3Nodes(jnp.asarray(Riw), jnp.asarray(tiw), jnp.asarray(siw)),
            jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
            jnp.asarray(np.stack(mR)), jnp.asarray(np.stack(mt)),
            jnp.asarray(ms, jnp.float32),
            jnp.ones(len(ei), bool), jnp.asarray(fixed), jnp.ones(n, bool),
            iters=15,
        )
        R_new, t_new, s_new = (np.asarray(x) for x in fetch(nodes.R, nodes.t, nodes.s))

        # correct map points using their reference keyframe's old/new Sim3
        old_R = st.kf_pose_cw[slots][:, :3, :3].copy()
        old_t = st.kf_pose_cw[slots][:, :3, 3].copy()
        for m in st.alive_mp_slots():
            ref = int(st.mp_ref_kf[m])
            i = slot_of.get(ref)
            if i is None:
                ob = st.obs.get(int(m), {})
                if not ob:
                    continue
                i = slot_of.get(next(iter(ob)))
                if i is None:
                    continue
            # p_cam = S_old_iw p ; p_new = S_new_iw^-1 p_cam
            pc = old_R[i] @ st.mp_pos[m] + old_t[i]
            p_new = (R_new[i].T @ (pc - t_new[i])) / s_new[i]
            st.set_mp_pos(m, p_new.astype(np.float32))
        # write back SE3 poses: T = [R | t/s]
        for i, kk in enumerate(slots):
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = R_new[i]
            T[:3, 3] = t_new[i] / s_new[i]
            st.set_kf_pose(int(kk), T)
        st.add_loop_edge(k, loop_kf)
        _log.info("loop closed: kf %d <-> kf %d (scale %.3f)", k, loop_kf, s)

        if self.run_global_ba:
            self.global_ba()

    # ------------------------------------------------------------------
    def global_ba(self, iters: int = 10):
        """Full-map BA (reference: RunGlobalBundleAdjustment, 10 LM
        iterations per server pass, MediatorScheduler.cc:122)."""
        st = self.store
        kfs = st.alive_kf_slots()
        mps = st.alive_mp_slots()
        if len(kfs) < 3 or len(mps) < 50:
            return
        cam_index = {int(kk): i for i, kk in enumerate(kfs)}
        pt_index = {int(m): i for i, m in enumerate(mps)}
        obs_cam, obs_pt, obs_uv, obs_is2 = [], [], [], []
        for m in mps:
            for kk, kp in st.obs.get(int(m), {}).items():
                ci = cam_index.get(kk)
                if ci is None:
                    continue
                obs_cam.append(ci)
                obs_pt.append(pt_index[int(m)])
                obs_uv.append(st.kf_kp_uv[kk, kp])
                obs_is2.append(1.0 / self.scale_factor ** (2.0 * st.kf_kp_octave[kk, kp]))
        if len(obs_cam) < 100:
            return
        fixed = np.zeros(len(kfs), bool)
        fixed[0] = True
        prob = ba_ops.build_padded_problem(
            st.kf_pose_cw[kfs], st.kf_K[kfs], fixed,
            st.mp_pos[mps], obs_cam, obs_pt, obs_uv, obs_is2,
        )
        res = ba_ops.bundle_adjust(prob, iters_a=iters // 2, iters_b=iters - iters // 2,
                                   mode="cg", cg_iters=32)
        Tn, pn = (np.asarray(x) for x in fetch(res.Tcw, res.pts))
        for i, kk in enumerate(kfs):
            if not fixed[i]:
                st.set_kf_pose(int(kk), Tn[i])
        for m, i in pt_index.items():
            st.set_mp_pos(m, pn[i])
