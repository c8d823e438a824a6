"""Instrument the loop-closing gates on the circuit fixture.

For each mediator loop-closer call: BoW candidates pre/post consistency,
Sim3 result, correction accept/reject — shows WHICH gate kills loop
closure under merged mapping (tests/test_loop_closing.py regression).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the container's sitecustomize initializes the axon (tunneled-TPU)
# platform before env vars can bite; diagnostics run on the CPU backend
# like the test suite (override with SWARMMAP_DIAG_PLATFORM=axon)
import jax

jax.config.update("jax_platforms",
                  os.environ.get("SWARMMAP_DIAG_PLATFORM", "cpu"))
from swarmmap_tpu.utils.compile_cache import configure as _configure_cache

_configure_cache(jax, platform=None)  # platform set above; cache keyed by host

from swarmmap_tpu.server.loop_closing import LoopClosing
from swarmmap_tpu.swarm import Swarm, SwarmConfig
from swarmmap_tpu.utils import datasets
from swarmmap_tpu.utils.config import CameraConfig, OrbConfig, Settings


def run(merged: bool, seed: int = 2, n_frames: int = 100):
    hw = (240, 320)
    seq = datasets.synthesize_sequence(
        n_frames=n_frames, hw=hw, seed=seed, agent=0, n_points=700,
        motion="circuit")
    w = seq.world
    settings = Settings(
        camera=CameraConfig(
            fx=float(w.K[0, 0]), fy=float(w.K[1, 1]),
            cx=float(w.K[0, 2]), cy=float(w.K[1, 2]),
            fps=20.0, width=hw[1], height=hw[0],
        ),
        orb=OrbConfig(n_features=400, n_levels=4),
    )
    swarm = Swarm(1, settings,
                  config=SwarmConfig(push_every=10, report_every=5),
                  run_server_gba=True)
    swarm.agents[0].system.local_mapping._merged_mapping = merged

    events = []
    orig_detect = LoopClosing.detect_loop
    orig_sim3 = LoopClosing.compute_sim3
    orig_correct = LoopClosing.correct_loop
    orig_process = LoopClosing.process_keyframe

    def process(self, k):
        self._diag_k = k
        return orig_process(self, k)

    def detect(self, k):
        st = self.store
        covis = st.covisible_kfs(k, 30)
        from swarmmap_tpu.ops.vocab import Vocabulary
        bow_k = self.kfdb.bow.get(k, {})
        min_score = min(
            (Vocabulary.score(bow_k, self.kfdb.bow.get(c, {})) for c in covis),
            default=0.0,
        )
        raw = (self.kfdb.detect_loop_candidates(st, k, min_score)
               if len(covis) >= 3 else [])
        out = orig_detect(self, k)
        if raw or out:
            events.append(("detect", k, len(covis), round(min_score, 4),
                           list(raw), list(out),
                           dict(self.consistency)))
        return out

    def sim3(self, k, cand):
        from swarmmap_tpu.server import sim3_match
        tr: list = []
        res = sim3_match.compute_sim3_between(
            self.store, k, self.store, cand, self._split_key(),
            self.scale_factor, self.n_levels, self.min_sim3_inliers,
            own_origin_only=True, trace=tr,
        )
        events.append(("sim3", k, cand,
                       None if res is None else round(float(res["s"]), 4),
                       tr))
        if res is None:
            return None
        return res["s"], res["R"], res["t"], (res["mp1"], res["mp2"])

    def correct(self, k, loop_kf, s, R, t, mp_pairs=None):
        ok = orig_correct(self, k, loop_kf, s, R, t, mp_pairs)
        events.append(("correct", k, loop_kf, ok))
        return ok

    LoopClosing.process_keyframe = process
    LoopClosing.detect_loop = detect
    LoopClosing.compute_sim3 = sim3
    LoopClosing.correct_loop = correct
    try:
        for i in range(n_frames):
            swarm.agents[0].track(seq.read(i), float(seq.timestamps[i]))
            swarm.frame_count += 1
            if swarm.frame_count % 10 == 0:
                swarm.sync()
        swarm.finish()
    finally:
        LoopClosing.process_keyframe = orig_process
        LoopClosing.detect_loop = orig_detect
        LoopClosing.compute_sim3 = orig_sim3
        LoopClosing.correct_loop = orig_correct
    med = swarm.mediators[0]
    lc = med.loop_closing
    print(f"\n=== merged={merged}: loops={lc.n_loops_closed} "
          f"fused={lc.n_fused} server_kf="
          f"{int(med.store.kf_alive[: med.store.n_kf].sum())} ===")
    for e in events:
        print("  ", e)
    return lc.n_loops_closed


if __name__ == "__main__":
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    if which in ("both", "on"):
        run(True, seed)
    if which in ("both", "off"):
        run(False, seed)
