"""Driver benchmark: 3-agent EuRoC-geometry tracking throughput on TPU.

Headline metric: the fused per-frame tracking program (ORB extraction at
752x480, 1000 features, 8 pyramid levels + guided matching against a
2048-point local map + LM pose optimization) batched over 3 agents — the
workload shape of the reference's headline 3-agent EuRoC MH01-03
configuration (BASELINE.md).  Baseline bar: EuRoC camera rate
(20 fps/agent = real time); the reference's own north-star is 2x that.

The same JSON line also reports the FULL system (`Swarm.step`: the
batched fused cohort + keyframe creation + local mapping + sync +
server) measured on a synthetic 3-agent sequence at the same geometry.
On this container every dispatch/fetch pays the axon tunnel's ~30-80 ms
RPC round trip (a real TPU host pays microseconds), so the swarm numbers
are a lower bound dominated by tunnel RPC, not device time.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
from __future__ import annotations

import json
import time

N_AGENTS = 3
HW = (480, 752)
N_FEATURES = 1000
N_LEVELS = 8
N_MAP_POINTS = 2048
BASELINE_FPS = 20.0  # EuRoC camera rate -> real-time bar (BASELINE.md)


def bench_swarm_step(budget_s: float = 420.0,
                     device_step_ms: float | None = None) -> dict:
    """Real combined-mode throughput: Swarm.step on synthetic sequences
    (3 agents, EuRoC geometry, full server loop, no viewer)."""
    import numpy as np

    from swarmmap_tpu.swarm import Swarm, SwarmConfig
    from swarmmap_tpu.utils import datasets
    from swarmmap_tpu.utils.config import CameraConfig, OrbConfig, Settings

    n_frames = 60
    seqs = [
        datasets.synthesize_sequence(
            n_frames=n_frames, hw=HW, seed=a, agent=a, n_points=1500
        )
        for a in range(N_AGENTS)
    ]
    w = seqs[0].world
    settings = Settings(
        camera=CameraConfig(
            fx=float(w.K[0, 0]), fy=float(w.K[1, 1]),
            cx=float(w.K[0, 2]), cy=float(w.K[1, 2]),
            fps=BASELINE_FPS, width=HW[1], height=HW[0],
        ),
        orb=OrbConfig(n_features=N_FEATURES, n_levels=N_LEVELS),
    )
    from swarmmap_tpu.utils.stats import STATS, measure_rpc_floor

    # async local mapping: tracking overlaps the mapping worker the way
    # the reference's free LocalMapping::Run thread does
    swarm = Swarm(N_AGENTS, settings,
                  config=SwarmConfig(push_every=20, report_every=10,
                                     async_mapping=True, async_server=True,
                                     double_buffer=True),
                  run_server_gba=False)
    # pre-render all frames: the python-loop synthetic renderer is
    # benchmark-harness cost (a real camera just hands over a buffer),
    # not system time — keep it out of the timed window
    frames = [[s.read(i) for s in seqs] for i in range(n_frames)]
    t_start = time.perf_counter()
    times = []
    done = 0
    steady_from = n_frames // 3  # init/compile-heavy warmup excluded
    n_steady = 0
    for i in range(n_frames):
        if done == steady_from:
            STATS.reset()
        t0 = time.perf_counter()
        swarm.step(frames[i], float(seqs[0].timestamps[i]))
        times.append(time.perf_counter() - t0)
        done += 1
        if time.perf_counter() - t_start > budget_s:
            break
    stats_snapshot = STATS.summary()  # before finish() pollutes the window
    swarm.finish()
    # steady state: skip the init/compile-heavy first third
    steady = times[min(steady_from, max(done - 1, 1)):] or times
    n_steady = len(steady)
    tail = sorted(steady)
    import statistics

    p50 = statistics.median(tail)
    p95 = tail[min(int(0.95 * len(tail)), len(tail) - 1)]
    tracked = min(a.frames_tracked for a in swarm.agents)
    # Honest transfer accounting.  Only BLOCKING device_get round trips
    # pay the tunnel (uploads/dispatches pipeline asynchronously; the
    # whole 7-array h2d stage measures ~6 ms, not 7x the floor).  The
    # tunnel-adjusted estimate replaces the MAIN-LOOP's measured blocking
    # fetch wall time (which on this container is ~30-80 ms of RPC per
    # round trip) with the device-resident cost a PCIe-attached host
    # pays: the independently measured fused-step device time
    # (`device_step_ms`, from the headline bench on the same program)
    # plus a 1 ms/fetch transfer allowance.
    s = stats_snapshot
    rpcs = s.get("rpc_fetch", {}).get("count", 0)
    rpc_per_frame = rpcs / max(n_steady, 1)
    main_fetches = s.get("fetch_wall_main", {}).get("count", 0)
    fetch_main_ms = (s.get("fetch_wall_main", {}).get("total_s", 0.0)
                     * 1e3 / max(n_steady, 1))
    main_per_frame = main_fetches / max(n_steady, 1)
    floor = measure_rpc_floor()
    floor_ms = floor["rpc_dispatch_fetch_ms"]
    dev_ms = device_step_ms if device_step_ms is not None else 5.0
    adj_ms = max(p50 * 1e3 - fetch_main_ms + dev_ms + main_per_frame * 1.0,
                 0.5)
    return {
        "swarm_fps_per_agent": round(1.0 / p50, 2),
        "swarm_step_p50_ms": round(p50 * 1e3, 1),
        "swarm_step_p95_ms": round(p95 * 1e3, 1),
        "swarm_frames": done,
        "swarm_min_tracked": int(tracked),
        "swarm_rpcs_per_step": round(rpc_per_frame, 2),
        "swarm_main_fetch_ms_per_step": round(fetch_main_ms, 1),
        "swarm_rpc_floor_ms": floor_ms,
        "swarm_device_step_ms": round(dev_ms, 2),
        "swarm_step_p50_tunnel_adj_ms": round(adj_ms, 1),
        "swarm_fps_per_agent_tunnel_adj": round(1e3 / adj_ms, 1),
        # device utilization: fraction of each swarm step the chip is
        # actually computing (VERDICT r4 #10 — makes host-bound
        # regressions visible at a glance; ~2% means the chip idles
        # through 98% of every step)
        "swarm_device_util_pct": round(100.0 * dev_ms / (p50 * 1e3), 1),
    }


def probe_device(attempts: int = 3, probe_timeout_s: float = 300.0,
                 backoff_s: float = 30.0) -> bool:
    """Check the device tunnel answers, WITHOUT touching it from this
    process: a wedged relay blocks the first device call on a futex
    forever, so the probe runs in killable subprocesses.  Retries with
    backoff — the relay has been observed to come back after minutes."""
    import subprocess
    import sys

    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.numpy.zeros(2).block_until_ready()"],
                timeout=probe_timeout_s, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"# device probe {i + 1}/{attempts} failed; retrying",
              flush=True)
        if i + 1 < attempts:
            time.sleep(backoff_s)
    return False


def host_fallback_record() -> dict:
    """The tunnel is permanently down this run: measure the same fused
    program on the CPU backend in a subprocess so the round still ships
    stage evidence instead of a bare null (the TPU metric stays null —
    a CPU number must never masquerade as one)."""
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import time, json, jax.numpy as jnp\n"
        "from swarmmap_tpu import pipeline\n"
        "inp = pipeline.realistic_track_inputs(hw=(240,320), n_map_points=512,"
        " n_features=256, n_levels=3)\n"
        "f = lambda x: pipeline.tracking_step(x, n_features=256, n_levels=3,"
        " hw=(240,320))\n"
        "out = f(inp); jax.block_until_ready(out.Tcw)\n"
        "t0 = time.perf_counter()\n"
        "for _ in range(10): out = f(inp._replace(Tcw_guess=out.Tcw))\n"
        "jax.block_until_ready(out.Tcw)\n"
        "print(json.dumps({'cpu_fused_step_ms':"
        " round((time.perf_counter()-t0)*100, 2),"
        " 'cpu_inliers': int(out.n_inliers)}))\n"
    )
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=900,
                           capture_output=True, text=True)
        lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        host = json.loads(lines[-1]) if lines else {"error": r.stderr[-200:]}
    except Exception as e:  # noqa: BLE001
        host = {"error": repr(e)[:200]}
    host["backend"] = "cpu-fallback"
    return host


def supervise(attempts: int = 3, child_timeout_s: float = 2400.0,
              backoff_s: float | None = None) -> None:
    """Run the bench body in a fresh subprocess with bounded retries
    (VERDICT r4 #9): a wedged tunnel blocks device init on a futex that
    no in-process watchdog can unwind, and round 3 lost its only perf
    number to exactly that.  A fresh process gets a fresh relay
    connection; one wedge no longer costs the round's evidence."""
    import os
    import subprocess
    import sys

    if backoff_s is None:
        backoff_s = float(os.environ.get("SWARMMAP_BENCH_BACKOFF_S", "60"))
    last = None
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                timeout=child_timeout_s, capture_output=True, text=True)
        except subprocess.TimeoutExpired as e:
            last = {"error": f"bench child exceeded {child_timeout_s}s",
                    "tail": (e.stdout or b"")[-400:].decode("utf-8", "replace")
                    if isinstance(e.stdout, bytes) else str(e.stdout)[-400:]}
            print(f"# bench attempt {i + 1}/{attempts} timed out; retrying "
                  f"in a fresh process", file=sys.stderr, flush=True)
            time.sleep(backoff_s)
            continue
        for ln in r.stdout.splitlines():
            if ln.startswith("{"):
                rec = json.loads(ln)
                if rec.get("value") is not None or i + 1 == attempts:
                    rec["bench_attempt"] = i + 1
                    print(json.dumps(rec))
                    raise SystemExit(r.returncode)
                last = rec  # wedge record: retry with a fresh process
                break
        else:
            last = {"error": "bench child produced no JSON",
                    "rc": r.returncode, "tail": r.stderr[-400:]}
        print(f"# bench attempt {i + 1}/{attempts} failed ({last.get('error', 'wedge')}); "
              f"retrying in a fresh process", file=sys.stderr, flush=True)
        if i + 1 < attempts:
            time.sleep(backoff_s)
    print(json.dumps({
        "metric": "tracking_fps_per_agent_3agent_euroc_geom",
        "value": None, "unit": "frames/s/agent", "vs_baseline": None,
        "error": f"all {attempts} bench attempts failed",
        "last": last,
    }))
    raise SystemExit(1)


def main() -> None:
    import os

    # fault-injection hooks for tests/test_bench_supervise.py: simulate
    # a wedged first attempt (the marker file makes it one-shot) and a
    # cheap success, so the retry logic is provable without a TPU run
    wedge_marker = os.environ.get("SWARMMAP_BENCH_WEDGE_ONCE")
    if wedge_marker and not os.path.exists(wedge_marker):
        open(wedge_marker, "w").close()
        print(json.dumps({
            "metric": "tracking_fps_per_agent_3agent_euroc_geom",
            "value": None, "unit": "frames/s/agent", "vs_baseline": None,
            "error": "injected wedge (SWARMMAP_BENCH_WEDGE_ONCE)",
        }))
        raise SystemExit(1)
    if os.environ.get("SWARMMAP_BENCH_FAKE_OK"):
        print(json.dumps({
            "metric": "tracking_fps_per_agent_3agent_euroc_geom",
            "value": 123.0, "unit": "frames/s/agent", "vs_baseline": 6.15,
        }))
        return

    if not probe_device():
        print(json.dumps({
            "metric": "tracking_fps_per_agent_3agent_euroc_geom",
            "value": None, "unit": "frames/s/agent",
            "vs_baseline": None,
            "error": "device tunnel down after 3 probes with backoff",
            "host_fallback": host_fallback_record(),
        }), flush=True)
        raise SystemExit(1)

    import jax

    # a dead/wedged device tunnel blocks the first dispatch forever;
    # emit a diagnosable JSON line and exit instead of hanging the
    # driver (observed: relay process death mid-round).  The probe above
    # said the tunnel is up; this guards a mid-run relay death.
    import threading

    alive = threading.Event()

    def _watchdog():
        if not alive.wait(240):
            print(json.dumps({
                "metric": "tracking_fps_per_agent_3agent_euroc_geom",
                "value": None, "unit": "frames/s/agent",
                "vs_baseline": None,
                "error": "device init wedged >240s after a good probe",
                "host_fallback": host_fallback_record(),
            }), flush=True)
            os._exit(1)

    threading.Thread(target=_watchdog, daemon=True).start()

    # persistent compile cache: tunnel compiles cost minutes; cached runs
    # start in seconds
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    # trivial device op: proves the device answers at all (the watchdog
    # only guards reachability — slow first compiles can take minutes
    # and are fine)
    jnp.zeros(4).block_until_ready()
    alive.set()

    from swarmmap_tpu import pipeline

    step = pipeline.make_multi_agent_step(
        n_features=N_FEATURES, n_levels=N_LEVELS, scale=1.2, hw=HW
    )
    # rendered synthetic-world steady-state inputs: real correspondences,
    # motion-model-grade pose guesses — the production workload shape
    # (pipeline.realistic_track_inputs), not random noise
    single = [
        pipeline.realistic_track_inputs(hw=HW, n_map_points=N_MAP_POINTS, seed=i)
        for i in range(N_AGENTS)
    ]
    batched = pipeline.TrackInputs(
        *(jnp.stack([getattr(s, f) for s in single]) for f in single[0]._fields)
    )

    # warmup / compile
    out = step(batched)
    jax.block_until_ready(out[0].Tcw)

    best = 0.0
    for _ in range(3):
        n_iter = 30
        t0 = time.perf_counter()
        cur = batched
        for _ in range(n_iter):
            out = step(cur)
            # chain the pose output into the next input: forces honest
            # sequential device execution (an unchained loop lets the
            # runtime coalesce/drop un-awaited executions)
            cur = cur._replace(Tcw_guess=out[0].Tcw)
        jax.block_until_ready(out[0].Tcw)
        dt = (time.perf_counter() - t0) / n_iter
        fps_per_agent = 1.0 / dt  # all agents advance one frame per step
        best = max(best, fps_per_agent)

    record = {
        "metric": "tracking_fps_per_agent_3agent_euroc_geom",
        "value": round(best, 2),
        "unit": "frames/s/agent",
        "vs_baseline": round(best / BASELINE_FPS, 3),
    }

    # distorted-camera variant: same compiled program (dist is a traced
    # input), EuRoC cam0 radial-tangential coefficients — proves the
    # flagship fused path serves the actual north-star calibration
    # (round-3 gap: fused_eligible demanded dist==0)
    EUROC_DIST = (-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0)
    single_d = [
        pipeline.realistic_track_inputs(
            hw=HW, n_map_points=N_MAP_POINTS, seed=i, dist=EUROC_DIST)
        for i in range(N_AGENTS)
    ]
    batched_d = pipeline.TrackInputs(
        *(jnp.stack([getattr(s, f) for s in single_d])
          for f in single_d[0]._fields)
    )
    out = step(batched_d)
    jax.block_until_ready(out[0].Tcw)
    inliers_d = [int(x) for x in out[0].n_inliers]
    best_d = 0.0
    for _ in range(2):
        n_iter = 30
        t0 = time.perf_counter()
        cur = batched_d
        for _ in range(n_iter):
            out = step(cur)
            cur = cur._replace(Tcw_guess=out[0].Tcw)
        jax.block_until_ready(out[0].Tcw)
        best_d = max(best_d, 1.0 / ((time.perf_counter() - t0) / n_iter))
    record["tracking_fps_per_agent_distorted"] = round(best_d, 2)
    record["distorted_inliers"] = inliers_d
    # full-system measurement (Swarm.step); never fails the bench
    try:
        record.update(bench_swarm_step(device_step_ms=1e3 / best))
        record["swarm_note"] = (
            "swarm numbers include ~30-80ms axon-tunnel RPC per "
            "dispatch/fetch that a real TPU host does not pay"
        )
    except Exception as e:  # noqa: BLE001
        record["swarm_error"] = repr(e)[:200]
    print(json.dumps(record))


if __name__ == "__main__":
    import sys

    if "--child" in sys.argv:
        main()
    else:
        supervise()
