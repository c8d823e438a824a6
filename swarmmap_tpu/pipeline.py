"""Fused device pipelines — the flagship per-frame program.

The reference splits a frame across CUDA kernels, CPU matcher loops, and
g2o (SURVEY.md §3.1).  Here the entire hot path of one tracked frame is
ONE XLA program (extraction -> guided matching against the local map ->
LM pose optimization), so per-frame host<->device traffic is a single
dispatch (SURVEY.md §7.4 hard part #5: latency discipline).

`multi_agent_step` is the same program vmapped over the agent axis and
shardable over a device mesh — the TPU-native answer to the reference's
one-thread-per-agent combined mode (SURVEY.md §2.10: agent data
parallelism).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .ops import extractor, matching, pose_opt


class TrackInputs(NamedTuple):
    image: jnp.ndarray        # [H,W] uint8
    Tcw_guess: jnp.ndarray    # [4,4]
    K: jnp.ndarray            # [3,3]
    dist: jnp.ndarray         # [5] radial-tangential (k1,k2,p1,p2,k3)
    mp_pos: jnp.ndarray       # [M,3] local-map points
    mp_desc: jnp.ndarray      # [M,8] u32
    mp_max_dist: jnp.ndarray  # [M]
    mp_valid: jnp.ndarray     # [M] bool


class TrackOutputs(NamedTuple):
    Tcw: jnp.ndarray          # [4,4] optimized pose
    n_inliers: jnp.ndarray    # scalar i32
    match_mp: jnp.ndarray     # [N_kp] i32 map-point index per keypoint (-1 none)
    features: extractor.FrameFeatures
    xy_ud: jnp.ndarray        # [N_kp,2] undistorted keypoint coords


@functools.partial(
    jax.jit,
    static_argnames=("n_features", "n_levels", "scale", "hw", "window_th"),
)
def tracking_step(
    inp: TrackInputs,
    n_features: int = 1000,
    n_levels: int = 8,
    scale: float = 1.2,
    hw: tuple[int, int] = (480, 752),
    window_th: float = 15.0,
) -> TrackOutputs:
    """One full tracked frame as a single XLA program."""
    feats = extractor.extract_orb(
        inp.image, n_features=n_features, n_levels=n_levels, scale=scale
    )
    # undistort keypoints INSIDE the fused program (reference:
    # Frame::UndistortKeyPoints, Frame.cc) — matching and pose
    # optimization operate in the pinhole frame, so calibrated cameras
    # (EuRoC k1=-0.283) take this path instead of the staged fallback.
    # The dist==0 select keeps the pinhole case BITWISE-identical to raw
    # detections (the (xy-c)/f*f+c round trip otherwise injects ~1e-3 px
    # of f32 noise into every coordinate); XLA fuses it all either way.
    no_dist = jnp.all(inp.dist == 0)
    xy_ud = jnp.where(
        no_dist, feats.xy, extractor.undistort_points(feats.xy, inp.K, inp.dist)
    )
    # visibility bounds from the undistorted image corners (reference:
    # Frame::ComputeImageBounds) — undistorted coords can legally exit
    # the raw [0,w)x[0,h) rectangle
    h_, w_ = hw
    corners = jnp.asarray(
        [[0.0, 0.0], [w_, 0.0], [0.0, h_], [w_, h_]], jnp.float32)
    cu = jnp.where(
        no_dist, corners, extractor.undistort_points(corners, inp.K, inp.dist)
    )
    bounds = (cu[:, 0].min(), cu[:, 0].max(), cu[:, 1].min(), cu[:, 1].max())
    uv, depth, visible = matching.project_to_frame(
        inp.Tcw_guess, inp.K, inp.mp_pos, hw, bounds=bounds
    )
    visible = visible & inp.mp_valid
    pred_oct = matching.predicted_octave(depth, inp.mp_max_dist, scale, n_levels)
    radius = window_th * jnp.asarray(scale) ** pred_oct.astype(jnp.float32)
    mask = matching.window_mask(
        uv, xy_ud, radius, visible, feats.valid,
        t_octave=feats.octave, oct_lo=pred_oct - 1, oct_hi=pred_oct + 1,
    )
    m = matching.masked_match(
        inp.mp_desc, feats.desc, mask, max_dist=matching.TH_HIGH, ratio=0.0
    )
    # invert matches scatter-free: the mutual-best pairing is an
    # involution, so keypoint t's map point is target_q[t] whenever that
    # query's match survived — gathers only
    n_kp = feats.xy.shape[0]
    t_ids = jnp.arange(n_kp, dtype=jnp.int32)
    bq = m.target_q                                # [N_kp] best query per kp
    match_mp = jnp.where(
        m.valid[bq] & (m.idx[bq] == t_ids), bq, -1
    ).astype(jnp.int32)
    # pose optimization over matched keypoints
    kp_mp = jnp.clip(match_mp, 0, inp.mp_pos.shape[0] - 1)
    valid = (match_mp >= 0) & feats.valid
    sig2 = jnp.asarray(scale, jnp.float32) ** (2.0 * feats.octave.astype(jnp.float32))
    # 2x8 LM schedule: one outlier re-gating round; the reference's 4x10
    # is conservative — GN on a good motion-model guess converges in <8
    # (full 4x10 remains the default for relocalization-grade problems).
    # Ablation: tests/test_pose_opt.py shows 2x8 matches 4x10 exactly on
    # clean synthetic problems; 2x5 also matches there but DEGRADES the
    # real pipeline (loop-closing e2e fails: compounding drift) — keep 8.
    # On TPU the whole optimization runs as ONE Pallas kernel
    # (ops/pallas_pose.py): the XLA lowering pays ~47us of launch latency
    # per sequential LM iteration (~0.7ms per frame), the kernel ~10us
    # total; same math, inlier sets agree to 99.8% (reduction-order f32).
    # The staged path (_pose_opt_frame) routes through the same
    # dispatcher with its 4x10 relocalization-grade schedule.
    res = pose_opt.pose_optimize_auto(
        inp.Tcw_guess, inp.K, inp.mp_pos[kp_mp], xy_ud,
        1.0 / sig2, valid, rounds=2, iters=8,
    )
    return TrackOutputs(
        Tcw=res.Tcw,
        n_inliers=res.inliers.sum().astype(jnp.int32),
        match_mp=jnp.where(res.inliers, match_mp, -1),
        features=feats,
        xy_ud=xy_ud,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_features", "n_levels", "scale", "hw", "window_th"),
)
def batched_tracking_step(
    inp: TrackInputs,
    n_features: int = 1000,
    n_levels: int = 8,
    scale: float = 1.2,
    hw: tuple[int, int] = (480, 752),
    window_th: float = 15.0,
) -> TrackOutputs:
    """tracking_step vmapped over a leading agent axis — the production
    combined-mode path: N agents' steady-state frames as ONE dispatch
    (the reference steps one CUDA pipeline per agent thread,
    swarm_map.cc:310-341; SURVEY.md §2.10 row 1)."""
    return jax.vmap(
        lambda x: tracking_step(
            x, n_features=n_features, n_levels=n_levels, scale=scale,
            hw=hw, window_th=window_th,
        )
    )(inp)


def make_multi_agent_step(
    n_features: int = 1000,
    n_levels: int = 8,
    scale: float = 1.2,
    hw: tuple[int, int] = (480, 752),
    window_th: float = 15.0,
    mesh: jax.sharding.Mesh | None = None,
    n_overlap_desc: int = 128,
):
    """vmapped (and optionally mesh-sharded) multi-agent tracking step.

    With a mesh, agents shard across devices ('agents' axis) and two
    cross-agent stages ride the ICI (SURVEY.md §2.10 row 1):
      - a psum of per-agent inlier counts (swarm-health fan-in), and
      - a **cross-agent descriptor prefilter**: each agent's strongest
        `n_overlap_desc` fresh descriptors are all_gathered over the
        agent axis and Hamming-matched pairwise, yielding an [N,N]
        overlap-hint matrix.  The host feeds it to the server's
        place-recognition budget (AgentMediator::CheckOverlapCandidates
        ranks its Sim3 attempts with it) — the device-resident analogue
        of the reference's cross-agent database fan-in
        (AgentMediator.cc:140-202).

    Returns (TrackOutputs [agent-axis batched], overlap [N,N] i32,
    total_inliers scalar); without a mesh overlap is computed with plain
    batched ops (same semantics, no collectives)."""

    def one_agent(inp: TrackInputs):
        return tracking_step(
            inp, n_features=n_features, n_levels=n_levels, scale=scale,
            hw=hw, window_th=window_th,
        )

    batched = jax.vmap(one_agent)
    D = n_overlap_desc

    def pair_overlap(desc_l, valid_l, desc_all, valid_all):
        """[L,D,8]x[N,D,8] -> [L,N] counts of descriptors with a Hamming
        match < TH_LOW on the other agent's frame."""
        x = jax.lax.population_count(
            desc_l[:, None, :, None, :] ^ desc_all[None, :, None, :, :]
        ).sum(-1).astype(jnp.int32)                      # [L,N,D,D]
        x = jnp.where(valid_all[None, :, None, :], x, 256)
        best = x.min(axis=3)                             # [L,N,D]
        hit = (best < 50) & valid_l[:, None, :]
        return hit.sum(-1).astype(jnp.int32)             # [L,N]

    if mesh is None:

        def plain(inputs: TrackInputs):
            out = batched(inputs)
            desc = out.features.desc[:, :D]
            valid = out.features.valid[:, :D]
            overlap = pair_overlap(desc, valid, desc, valid)
            return out, overlap, out.n_inliers.sum()

        return jax.jit(plain)

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def sharded(inputs: TrackInputs):
        out = batched(inputs)
        total = jax.lax.psum(out.n_inliers.sum(), axis_name="agents")
        desc = out.features.desc[:, :D]
        valid = out.features.valid[:, :D]
        # the ICI stage: gather every agent's descriptor sample
        desc_all = jax.lax.all_gather(desc, "agents", axis=0, tiled=True)
        valid_all = jax.lax.all_gather(valid, "agents", axis=0, tiled=True)
        overlap = pair_overlap(desc, valid, desc_all, valid_all)
        return out, overlap, total

    spec_in = TrackInputs(*([P("agents")] * len(TrackInputs._fields)))
    feat_spec = extractor.FrameFeatures(
        *([P("agents")] * len(extractor.FrameFeatures._fields))
    )
    spec_out = TrackOutputs(
        Tcw=P("agents"), n_inliers=P("agents"), match_mp=P("agents"),
        features=feat_spec, xy_ud=P("agents"),
    )
    fn = shard_map(
        sharded, mesh=mesh,
        in_specs=(spec_in,),
        out_specs=(spec_out, P("agents"), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def realistic_track_inputs(
    hw: tuple[int, int] = (480, 752), n_map_points: int = 2048, seed: int = 0,
    n_features: int = 1000, n_levels: int = 8, scale: float = 1.2,
    dist: tuple[float, ...] = (0.0, 0.0, 0.0, 0.0, 0.0),
) -> TrackInputs:
    """Steady-state inputs from a RENDERED synthetic world: the local map
    holds true landmark positions with descriptors extracted from the
    previous frame, and the pose guess is the previous frame's true pose
    — so matching finds real correspondences and LM converges the way it
    does in production (unlike the random-noise example inputs, where
    spurious matches force worst-case iteration counts)."""
    import numpy as np

    from .ops import extractor
    from .utils import datasets

    # a 40-frame arc gives EuRoC-like per-frame motion; render only the
    # middle three frames (full-sequence rendering is seconds per frame)
    f0, f1, f2 = 19, 20, 21
    w = datasets.make_world(
        n_points=min(n_map_points, 1500), n_frames=40, hw=hw, seed=seed,
        dist=np.asarray(dist, np.float32),
    )
    prev = datasets.render_frame(w, f1)
    feats = extractor.extract_orb(
        jnp.asarray(prev), n_features=n_features, n_levels=n_levels, scale=scale
    )
    xy, desc, valid = (np.asarray(x) for x in (feats.xy, feats.desc, feats.valid))
    # associate detected keypoints to the world landmarks they image
    Tcw0 = np.linalg.inv(w.poses_wc[f0]).astype(np.float32)
    Tcw_prev = np.linalg.inv(w.poses_wc[f1]).astype(np.float32)
    pc = (Tcw_prev[:3, :3] @ w.points.T).T + Tcw_prev[:3, 3]
    # associate in the DISTORTED frame: detections live there
    uvw = datasets.distort_points_np(pc, w.K, w.dist)
    infront = pc[:, 2] > 0.1
    octv = np.asarray(feats.octave)
    pos_l, desc_l, maxd_l = [], [], []
    for i in np.where(valid)[0]:
        d2 = np.sum((uvw - xy[i]) ** 2, 1)
        d2[~infront] = np.inf
        j = int(np.argmin(d2))
        if d2[j] < 4.0:
            pos_l.append(w.points[j])
            desc_l.append(desc[i])
            # max_dist = viewing distance * scale^octave (the
            # UpdateNormalAndDepth rule, so predicted_octave gates right)
            maxd_l.append(np.linalg.norm(pc[j]) * scale ** octv[i])
    n = len(pos_l)
    rng = np.random.RandomState(seed)
    pos = np.zeros((n_map_points, 3), np.float32)
    dsc = np.zeros((n_map_points, 8), np.uint32)
    maxd = np.full(n_map_points, 12.0, np.float32)
    ok = np.zeros(n_map_points, bool)
    m = min(n, n_map_points)
    pos[:m] = np.asarray(pos_l, np.float32)[:m]
    dsc[:m] = np.asarray(desc_l, np.uint32)[:m]
    maxd[:m] = np.asarray(maxd_l, np.float32)[:m]
    ok[:m] = True
    # pad with far-away distractors (realistic maps carry stale points)
    pos[m:] = rng.uniform(-8, 8, (n_map_points - m, 3))
    dsc[m:] = rng.randint(0, 2**32, (n_map_points - m, 8), dtype=np.uint32)
    # constant-velocity extrapolation, exactly what the fused path feeds
    guess = (Tcw_prev @ np.linalg.inv(Tcw0) @ Tcw_prev).astype(np.float32)
    return TrackInputs(
        image=jnp.asarray(datasets.render_frame(w, f2)),
        Tcw_guess=jnp.asarray(guess),
        K=jnp.asarray(w.K.astype(np.float32)),
        dist=jnp.asarray(w.dist.astype(np.float32)),
        mp_pos=jnp.asarray(pos),
        mp_desc=jnp.asarray(dsc),
        mp_max_dist=jnp.asarray(maxd),
        mp_valid=jnp.asarray(ok),
    )


def example_track_inputs(
    hw: tuple[int, int] = (480, 752), n_map_points: int = 2048, seed: int = 0
) -> TrackInputs:
    """Deterministic example inputs (used by bench + the graft entry)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    h, w = hw
    img = rng.randint(0, 255, (h, w)).astype(np.uint8)
    K = np.array([[458.0, 0, w / 2], [0, 457.0, h / 2], [0, 0, 1]], np.float32)
    pts = np.stack(
        [rng.uniform(-4, 4, n_map_points), rng.uniform(-3, 3, n_map_points),
         rng.uniform(3, 10, n_map_points)], 1,
    ).astype(np.float32)
    return TrackInputs(
        image=jnp.asarray(img),
        Tcw_guess=jnp.eye(4, dtype=jnp.float32),
        K=jnp.asarray(K),
        dist=jnp.zeros(5, jnp.float32),
        mp_pos=jnp.asarray(pts),
        mp_desc=jnp.asarray(rng.randint(0, 2**32, (n_map_points, 8), dtype=np.uint32)),
        mp_max_dist=jnp.full((n_map_points,), 12.0, jnp.float32),
        mp_valid=jnp.ones((n_map_points,), bool),
    )
