"""Failure-injection stress tests (SURVEY.md §5 elastic membership):
late join, mid-run dropout + relocalizing rejoin, dropped pushes, and
out-of-order slice delivery must all leave the swarm consistent."""
import numpy as np
import pytest

from swarmmap_tpu.swarm import Swarm, SwarmConfig
from swarmmap_tpu.utils import datasets
from swarmmap_tpu.utils.config import CameraConfig, OrbConfig, Settings


def make_settings(world, hw):
    return Settings(
        camera=CameraConfig(
            fx=float(world.K[0, 0]), fy=float(world.K[1, 1]),
            cx=float(world.K[0, 2]), cy=float(world.K[1, 2]),
            fps=20.0, width=hw[1], height=hw[0],
        ),
        orb=OrbConfig(n_features=400, n_levels=4),
    )


HW = (240, 320)
N_FRAMES = 36


def _make(n_agents, seed0=0, n_frames=N_FRAMES):
    seqs = [
        datasets.synthesize_sequence(n_frames=n_frames, hw=HW, seed=seed0,
                                     agent=a, n_points=350)
        for a in range(n_agents)
    ]
    settings = make_settings(seqs[0].world, HW)
    swarm = Swarm(n_agents, settings,
                  config=SwarmConfig(push_every=8, report_every=4),
                  run_server_gba=False)
    return swarm, seqs


def test_late_join_and_mid_run_dropout():
    """Agent 1 joins a third of the way in; agent 0 blacks out for a
    stretch and must relocalize; both maps end up on the server."""
    swarm, seqs = _make(2)
    for i in range(N_FRAMES):
        imgs = [seqs[0].read(i), seqs[1].read(i) if i >= N_FRAMES // 3 else None]
        if N_FRAMES // 2 <= i < N_FRAMES // 2 + 4:
            imgs[0] = None  # agent 0 sensor blackout
        swarm.step(imgs, float(seqs[0].timestamps[i]))
    swarm.finish()
    a0, a1 = swarm.agents
    assert a0.frames_tracked > 0.6 * N_FRAMES
    assert a1.frames_tracked > 0.5 * (N_FRAMES - N_FRAMES // 3)
    # both replicas exist and are populated
    for med in swarm.mediators:
        assert len(med.store.kf_by_gid) >= 2, f"map {med.map_id} empty on server"


def test_dropped_pushes_recovered_by_later_push():
    """Losing whole pushes must not wedge the replica: later slices ship
    new elements whole, and the restoration queue parks updates whose
    targets never arrived."""
    swarm, seqs = _make(1)
    agent = swarm.agents[0]
    dropped = {"n": 0}

    for i in range(N_FRAMES):
        swarm.frame_count += 1
        agent.track(seqs[0].read(i), float(seqs[0].timestamps[i]))
        if swarm.frame_count % 8 == 0:
            payload = agent.push_payload()
            if payload is None:
                continue
            # drop the first two pushes entirely
            if dropped["n"] < 2:
                dropped["n"] += 1
                continue
            swarm.scheduler.enqueue_request(0, payload)
            swarm.scheduler.process_pending()
    swarm.finish()
    assert dropped["n"] == 2
    med = swarm.mediators[0]
    st = med.store
    # replica caught up despite the lost slices: the surviving pushes
    # carried at least the keyframes created after the drops
    assert len(st.kf_by_gid) >= 1
    # parked updates (targets lost with the dropped slices) are bounded
    assert len(st.pending_obs) < 10000


def test_out_of_order_slice_delivery():
    """Deliver a client's pushes to the server in reverse order: the
    restoration queue must reattach observations once their elements
    arrive, matching Map.cc:401's out-of-order tolerance."""
    swarm, seqs = _make(1)
    agent = swarm.agents[0]
    payloads = []
    for i in range(N_FRAMES):
        agent.track(seqs[0].read(i), float(seqs[0].timestamps[i]))
        if (i + 1) % 6 == 0:
            p = agent.push_payload()
            if p is not None:
                payloads.append(p)
    assert len(payloads) >= 3
    for p in reversed(payloads):
        swarm.scheduler.enqueue_request(0, p)
        swarm.scheduler.process_pending()
    st = swarm.mediators[0].store
    n_kf_client = int(agent.system.store.kf_alive[: agent.system.store.n_kf].sum())
    assert len(st.kf_by_gid) >= n_kf_client - 1
    # observations reattached: server covisibility is populated
    total_obs = sum(len(v) for v in st.obs.values())
    assert total_obs > 50
