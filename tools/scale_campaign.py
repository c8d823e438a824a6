"""Reference-scale synthetic campaign (VERDICT r2 item 2).

5 agents on a shared rendered world at EuRoC geometry (480x752, 1000
features, 8 levels), >=300 frames each on loop circuits — the scale of
the reference's mh12345 configuration (/root/reference/config/
mh12345.yaml) that the unit-scale e2e tests never reach.  Exercises
culling, restoration queues, covisibility rebuild, loop closing, GBA,
scoring, and cross-agent merging at hundreds of keyframes / tens of
thousands of points, and asserts:

  - every agent tracks >=85% of its frames
  - total map size reaches >=300 alive KFs and >=30k observations
  - >=2 loop closures fire across the swarm
  - at least one map group merges >=3 maps
  - per-agent ATE RMSE < 5% of trajectory span
  - merged-group global trajectories < 5% of span

Writes SCALE_r03.json at the repo root and exits nonzero on any failed
assertion.  Run on the TPU (tunnel) or any backend:

    python tools/scale_campaign.py            # full (5 agents x 300)
    SCALE_FRAMES=80 python tools/scale_campaign.py   # smoke
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax

# SCALE_MESH=<n>: run the campaign with agents sharded over an n-device
# virtual CPU mesh (VERDICT r4 #7 — the multichip path at campaign
# scale, not just the dryrun).  Must configure before first backend use.
_MESH_N = int(os.environ.get("SCALE_MESH", "0") or 0)
if _MESH_N:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + f" --xla_force_host_platform_device_count={_MESH_N}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from swarmmap_tpu.utils.compile_cache import configure as _configure_cache

_configure_cache(jax, platform="cpu" if _MESH_N else None)

import numpy as np  # noqa: E402

from swarmmap_tpu import MAP_BASE  # noqa: E402
from swarmmap_tpu.swarm import Swarm, SwarmConfig  # noqa: E402
from swarmmap_tpu.utils import datasets  # noqa: E402
from swarmmap_tpu.utils.config import CameraConfig, OrbConfig, Settings  # noqa: E402
from swarmmap_tpu.utils.trajectory import ate_rmse  # noqa: E402

N_AGENTS = int(os.environ.get("SCALE_AGENTS", "5"))
N_FRAMES = int(os.environ.get("SCALE_FRAMES", "300"))
HW = (480, 752)
N_POINTS = int(os.environ.get("SCALE_POINTS", "2600"))


def _render_sequences():
    """Render (or reload from cache — retries after a wedged tunnel
    shouldn't pay the ~5 min of rendering again)."""
    cache = os.environ.get("SCALE_CACHE", "/tmp/scale_frames.npz")
    key = f"{N_AGENTS}x{N_FRAMES}x{HW}x{N_POINTS}"
    if cache and os.path.exists(cache):
        z = np.load(cache, allow_pickle=True)
        if str(z["key"]) == key:
            print("loading cached frames", flush=True)
            seqs = []
            for a in range(N_AGENTS):
                w = datasets.make_world(
                    n_points=N_POINTS, n_frames=N_FRAMES, hw=HW, seed=7,
                    agent=a, motion="circuit")
                seq = datasets.ImageSequence(
                    paths=[], timestamps=z[f"ts{a}"], frames=z[f"f{a}"])
                seq.world = w
                seqs.append(seq)
            return seqs
    print(f"rendering {N_AGENTS} x {N_FRAMES} frames at {HW} ...", flush=True)
    seqs = [
        datasets.synthesize_sequence(
            n_frames=N_FRAMES, hw=HW, seed=7, agent=a, n_points=N_POINTS,
            motion="circuit",
        )
        for a in range(N_AGENTS)
    ]
    if cache:
        np.savez_compressed(
            cache, key=key,
            **{f"f{a}": seqs[a].frames for a in range(N_AGENTS)},
            **{f"ts{a}": seqs[a].timestamps for a in range(N_AGENTS)},
        )
    return seqs


def main() -> int:
    t_wall = time.time()
    # the tunneled backend occasionally wedges forever at first contact;
    # fail fast so the retry wrapper can relaunch cheaply
    import threading

    init_ok = threading.Event()

    def _init_watchdog():
        if not init_ok.wait(150):
            print("init watchdog: device init wedged, exiting 99 for retry",
                  flush=True)
            os._exit(99)

    threading.Thread(target=_init_watchdog, daemon=True).start()
    import jax.numpy as jnp

    jnp.zeros(4).block_until_ready()
    init_ok.set()
    print("device ok:", jax.default_backend(), flush=True)

    # mid-run stall watchdog: a dying tunnel wedges every device call on
    # a futex forever (observed: relay process death at minute 33 of a
    # 35-minute run).  Exit 99 so a retry wrapper can relaunch once the
    # tunnel returns instead of hanging until the driver kills us.
    heartbeat = [time.time()]
    # a loop-closure step (correct + fuse + full GBA) can legitimately
    # run minutes on a contended host — keep the default generous and
    # overridable (SCALE_STALL_S) rather than kill a healthy run
    stall_s = float(os.environ.get("SCALE_STALL_S", "900"))

    def _stall_watchdog():
        while True:
            time.sleep(30)
            if time.time() - heartbeat[0] > stall_s:
                print(f"stall watchdog: no progress in {stall_s:.0f}s "
                      "(wedged tunnel?), exiting 99 for retry", flush=True)
                os._exit(99)

    threading.Thread(target=_stall_watchdog, daemon=True).start()

    seqs = _render_sequences()
    w = seqs[0].world
    settings = Settings(
        camera=CameraConfig(
            fx=float(w.K[0, 0]), fy=float(w.K[1, 1]),
            cx=float(w.K[0, 2]), cy=float(w.K[1, 2]),
            fps=20.0, width=HW[1], height=HW[0],
        ),
        orb=OrbConfig(n_features=1000, n_levels=8),
    )
    # bench-identical configuration (VERDICT r4 #5): the campaign gates
    # the same async_mapping + async_server + double_buffer stack that
    # bench.py measures (SCALE_SYNC=1 restores the synchronous paths)
    fast = not os.environ.get("SCALE_SYNC")
    swarm = Swarm(N_AGENTS, settings,
                  config=SwarmConfig(push_every=20, report_every=10,
                                     async_mapping=fast, async_server=fast,
                                     double_buffer=fast,
                                     mesh_agents=bool(_MESH_N) or None),
                  run_server_gba=True)
    if _MESH_N:
        assert swarm.mesh is not None, "SCALE_MESH set but no mesh built"
    def _server_own_fit():
        """Per-map internal distortion diagnostic: optimal-Sim3 residual
        of each SERVER replica's own genuine keyframes against ground
        truth.  A map that is merely mis-gauged fits to ~0; a warped map
        cannot (host-only math, run at checkpoints under SCALE_DIAG)."""
        from swarmmap_tpu.utils.trajectory import umeyama_align
        out = {}
        for mid, med in enumerate(swarm.mediators):
            st = med.store
            with st.lock:
                est, gt = [], []
                for k in st.alive_kf_slots():
                    if not st.kf_genuine[k] or int(st.kf_gid[k]) // MAP_BASE != mid:
                        continue
                    fi = int(round(st.kf_ts[k] * 20))
                    if fi >= N_FRAMES:
                        continue
                    est.append(np.linalg.inv(st.kf_pose_cw[k])[:3, 3])
                    gt.append(seqs[mid].world.poses_wc[fi][:3, 3])
            if len(est) < 8:
                continue
            est, gt = np.stack(est), np.stack(gt)
            s, R, t = umeyama_align(est, gt)
            out[mid] = round(float(np.sqrt(
                (((est @ (s * R).T + t) - gt) ** 2).sum(1).mean())), 3)
        return out

    diag = bool(os.environ.get("SCALE_DIAG"))
    if os.environ.get("SCALE_DIAG2"):
        # per-push forensics: print each map's own-fit after every
        # server pass to pinpoint which request introduces a warp
        orig = type(swarm.scheduler).process_request

        def wrapped(self, agent_id, sl, _orig=orig):
            _orig(self, agent_id, sl)
            print(f"  [diag] after push a{agent_id}: {_server_own_fit()}",
                  flush=True)

        swarm.scheduler.process_request = wrapped.__get__(swarm.scheduler)
    t0 = time.time()
    for i in range(N_FRAMES):
        swarm.step([s.read(i) for s in seqs], float(seqs[0].timestamps[i]))
        heartbeat[0] = time.time()
        if (i + 1) % 50 == 0:
            print(f"  frame {i+1}/{N_FRAMES}  "
                  f"tracked={[a.frames_tracked for a in swarm.agents]}",
                  flush=True)
            if diag:
                print(f"  server own-fit rmse: {_server_own_fit()}",
                      flush=True)
    for a in swarm.agents:
        a.system.local_mapping.wait_idle(timeout=120)
    if diag:
        print(f"  server own-fit rmse pre-finish: {_server_own_fit()}",
              flush=True)
    swarm.finish()
    if diag:
        print(f"  server own-fit rmse post-finish: {_server_own_fit()}",
              flush=True)
    run_s = time.time() - t0

    results: dict = {
        "n_agents": N_AGENTS, "n_frames": N_FRAMES, "hw": list(HW),
        "backend": jax.default_backend(),
        "run_s": round(run_s, 1),
        "fps_per_agent": round(N_FRAMES / run_s, 2),
    }
    failures: list[str] = []

    def check(name, ok, detail):
        results[name] = detail
        if not ok:
            failures.append(f"{name}: {detail}")
        print(("PASS " if ok else "FAIL ") + f"{name}: {detail}", flush=True)

    # 1. tracking coverage
    tracked = [a.frames_tracked for a in swarm.agents]
    check("tracked_frames", min(tracked) >= 0.85 * N_FRAMES, tracked)

    # 2. map scale
    n_kf = sum(int(a.system.store.kf_alive[: a.system.store.n_kf].sum())
               for a in swarm.agents)
    n_mp = sum(int(a.system.store.mp_alive[: a.system.store.n_mp].sum())
               for a in swarm.agents)
    n_obs = sum(int(a.system.store.obs_alive[: a.system.store.obs_n].sum())
                for a in swarm.agents)
    check("map_scale", n_kf >= 300 and n_obs >= 30000,
          {"alive_kfs": n_kf, "alive_mps": n_mp, "alive_obs": n_obs})

    # 3. loop closures across the swarm (server-side loop closers)
    n_loops = sum(m.loop_closing.n_loops_closed for m in swarm.mediators)
    check("loop_closures", n_loops >= 2, n_loops)

    # 4. multi-map merge
    groups = swarm.merged_groups()
    biggest = max(groups, key=len)
    check("merged_group", len(biggest) >= 3,
          {"groups": [sorted(g) for g in groups]})

    # 5. per-agent ATE < 5% of span
    ates = {}
    for a, seq in zip(swarm.agents, seqs):
        traj = a.system.tracking.trajectory
        est, gt = [], []
        for ts, Twc in traj:
            fi = int(round(ts * 20))
            if fi < N_FRAMES:
                est.append(Twc[:3, 3])
                gt.append(seq.world.poses_wc[fi][:3, 3])
        est, gt = np.stack(est), np.stack(gt)
        rmse = ate_rmse(est, gt)
        span = float(np.linalg.norm(gt.max(0) - gt.min(0)))
        ates[a.agent_id] = {"ate": round(rmse, 3), "span": round(span, 2),
                            "pct": round(100 * rmse / span, 2)}
    check("agent_ate", all(v["pct"] < 5.0 for v in ates.values()), ates)

    # 6. merged-group ATE in the GLOBAL frame: server keyframe poses of
    # every map in the biggest group, mapped through Twl, against truth
    g_est, g_gt = [], []
    map_ranges = []
    for mid in sorted(biggest):
        med = swarm.mediators[mid]
        st = med.store
        seq = seqs[mid]
        idx0 = len(g_est)
        for k in st.alive_kf_slots():
            gid = int(st.kf_gid[k])
            if gid // MAP_BASE != mid:
                continue  # foreign (fused) keyframes counted by their owner
            if not st.kf_genuine[k]:
                continue  # MBP virtual cameras have no ground-truth frame
            fi = int(round(st.kf_ts[k] * 20))
            if fi >= N_FRAMES:
                continue
            Twc = np.linalg.inv(st.kf_global_pose(k))
            g_est.append(Twc[:3, 3])
            g_gt.append(seq.world.poses_wc[fi][:3, 3])
        map_ranges.append((idx0, len(g_est)))
    g_est, g_gt = np.stack(g_est), np.stack(g_gt)
    g_rmse = ate_rmse(g_est, g_gt)
    g_span = float(np.linalg.norm(g_gt.max(0) - g_gt.min(0)))
    check("group_ate",
          g_rmse < 0.05 * g_span,
          {"ate": round(g_rmse, 3), "span": round(g_span, 2),
           "pct": round(100 * g_rmse / g_span, 2),
           "n_kfs": len(g_est)})

    # diagnostics: per-map residual inside the single group gauge, and
    # each map's independent Sim3 fit (how good its Twl COULD be)
    from swarmmap_tpu.utils.trajectory import umeyama_align

    s_g, R_g, t_g = umeyama_align(g_est, g_gt)
    per_map = {}
    for mid, (idx0, idx1) in zip(sorted(biggest), map_ranges):
        e, g = g_est[idx0:idx1], g_gt[idx0:idx1]
        if len(e) < 3:
            continue
        res_gauge = float(np.sqrt(
            (((e @ (s_g * R_g).T + t_g) - g) ** 2).sum(1).mean()))
        own_rmse = ate_rmse(e, g)
        s_own, _, _ = umeyama_align(e, g)
        per_map[mid] = {"in_gauge_rmse": round(res_gauge, 3),
                        "own_fit_rmse": round(own_rmse, 3),
                        "own_fit_scale_vs_gauge": round(s_own / s_g, 4),
                        "n": int(len(e))}
    results["group_per_map"] = per_map
    print("group per-map:", json.dumps(per_map), flush=True)

    dump = os.environ.get("SCALE_DUMP")
    if dump:
        state: dict = {}
        for mid, med in enumerate(swarm.mediators):
            st = med.store
            n = st.n_kf
            state.update({
                f"m{mid}_pose": st.kf_pose_cw[:n].copy(),
                f"m{mid}_ts": st.kf_ts[:n].copy(),
                f"m{mid}_alive": st.kf_alive[:n].copy(),
                f"m{mid}_genuine": st.kf_genuine[:n].copy(),
                f"m{mid}_gid": st.kf_gid[:n].copy(),
                f"m{mid}_Twl_R": st.Twl_R, f"m{mid}_Twl_t": st.Twl_t,
                f"m{mid}_Twl_s": np.float32(st.Twl_s),
            })
            cst = swarm.agents[mid].system.store
            state[f"c{mid}_pose"] = cst.kf_pose_cw[: cst.n_kf].copy()
            state[f"c{mid}_ts"] = cst.kf_ts[: cst.n_kf].copy()
            state[f"c{mid}_alive"] = cst.kf_alive[: cst.n_kf].copy()
            state[f"c{mid}_gid"] = cst.kf_gid[: cst.n_kf].copy()
            state[f"gt{mid}"] = seqs[mid].world.poses_wc
        np.savez_compressed(dump, **state)
        print("state dumped to", dump, flush=True)

    results["wall_s_total"] = round(time.time() - t_wall, 1)
    results["ok"] = not failures
    out = os.environ.get("SCALE_OUT") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_r03.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: results[k] for k in
                      ("ok", "run_s", "fps_per_agent")}), flush=True)
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
