"""Dynamic-object handling (reference: code/src/{DynamicExtractor,
DynamicRunner}.cc — Dynamic_ORB_SLAM2 heritage, §2.8 of SURVEY.md).

The reference runs mask-RCNN through cv::dnn with optical-flow mask
propagation, then votes MapPoints dynamic (MapPoint.h:129-132).  Like the
reference's monocular entry points, this subsystem is OPTIONAL and not
wired into the default pipeline.

This rebuild keeps the same architecture with a pluggable segmenter:
  - `segment_fn(image) -> bool mask [H,W]` — any model (a cv2.dnn
    mask-RCNN, a JAX segmenter, ...); no weights ship in this
    environment, so the built-in default is a motion-inconsistency
    detector: keypoints whose reprojection residuals repeatedly disagree
    with the rigid-motion estimate accumulate dynamic votes.
  - `DynamicRunner` — priority-ordered batch worker over keyframes
    voting their observed MapPoints dynamic/static.
"""
from __future__ import annotations

import heapq
from typing import Callable

import numpy as np

from .map_store import NO_MP, MapStore

DYNAMIC_VOTE_TH = 3       # votes needed to flag a point dynamic
VOTE_RATIO = 2.0          # dynamic votes must dominate static by this


class DynamicVotes:
    """Per-map dynamic/static vote ledger (MapPoint.h:129-132 analogue)."""

    def __init__(self, store: MapStore):
        self.store = store
        self.dyn = np.zeros(len(store.mp_alive), np.int32)
        self.stat = np.zeros(len(store.mp_alive), np.int32)

    def _ensure(self):
        n = len(self.store.mp_alive)
        if len(self.dyn) < n:
            self.dyn = np.resize(self.dyn, n)
            self.stat = np.resize(self.stat, n)

    def vote(self, mp_slots: np.ndarray, dynamic: np.ndarray):
        self._ensure()
        np.add.at(self.dyn, mp_slots[dynamic], 1)
        np.add.at(self.stat, mp_slots[~dynamic], 1)

    def is_dynamic(self, mp_slots: np.ndarray) -> np.ndarray:
        self._ensure()
        d = self.dyn[mp_slots]
        s = self.stat[mp_slots]
        return (d >= DYNAMIC_VOTE_TH) & (d > VOTE_RATIO * np.maximum(s, 1))


class DynamicRunner:
    """Batch worker: processes keyframes by score priority, votes their
    points via the segmenter mask (reference: DynamicRunner singleton)."""

    def __init__(self, store: MapStore,
                 segment_fn: Callable[[np.ndarray], np.ndarray] | None = None):
        self.store = store
        self.votes = DynamicVotes(store)
        self.segment_fn = segment_fn
        self._heap: list[tuple[float, int, np.ndarray]] = []
        self._seq = 0

    def enqueue(self, kf_slot: int, image: np.ndarray, score: float = 0.0):
        heapq.heappush(self._heap, (-score, self._seq, kf_slot, image))
        self._seq += 1

    def process(self, max_items: int = 4) -> int:
        """Run the segmenter over the highest-priority keyframes and vote
        their observed points."""
        if self.segment_fn is None:
            return 0
        st = self.store
        n = 0
        while self._heap and n < max_items:
            _, _, k, image = heapq.heappop(self._heap)
            if not st.kf_alive[k]:
                continue
            mask = self.segment_fn(image)
            uv = st.kf_kp_uv[k]
            mp = st.kf_kp_mp[k]
            has = (mp != NO_MP) & st.kf_kp_valid[k]
            xs = np.clip(uv[has, 0].astype(int), 0, mask.shape[1] - 1)
            ys = np.clip(uv[has, 1].astype(int), 0, mask.shape[0] - 1)
            self.votes.vote(mp[has], mask[ys, xs])
            n += 1
        return n

    def vote_from_residuals(self, mp_slots: np.ndarray, chi2: np.ndarray,
                            chi2_th: float = 5.991):
        """Model-free fallback: outlier residuals under the rigid-motion
        estimate count as dynamic evidence."""
        self.votes.vote(np.asarray(mp_slots), np.asarray(chi2) > 4 * chi2_th)

    def filter_static(self, mp_slots: np.ndarray) -> np.ndarray:
        """Mask of points safe to track (not voted dynamic)."""
        return ~self.votes.is_dynamic(np.asarray(mp_slots))
