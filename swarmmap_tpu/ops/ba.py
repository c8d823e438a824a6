"""Bundle adjustment (device) — the g2o replacement.

Reference spec: Optimizer::LocalBundleAdjustment
(/root/reference/code/src/Optimizer.cc:436-741) and
Optimizer::GlobalBundleAdjustment (:~60) — Levenberg-Marquardt over camera
SE(3) vertices + point vertices with monocular reprojection edges, Huber
delta sqrt(5.991), 5+10 iteration schedule with chi-square outlier pruning
in between, fixed-frontier cameras.

TPU formulation (SURVEY.md §7.4 hard part #1): the observation graph is a
padded COO table; every LM iteration builds the Schur-reduced camera
system with segment-sums over observations.  Two reduction backends:

  - "dense": materialize the [C*6, C*6] reduced system via scatter-adds
    over a per-(point, camera) dense W block tensor and solve exactly —
    right for local BA (C <= ~128).
  - "cg":   never materialize W; preconditioned conjugate gradients with
    matvecs expressed as three segment-sums per application — scales to
    global BA with hundreds of cameras / 100k observations.

Fixed shapes, masked validity, no dynamic sparsity — compaction is the
caller's job (SURVEY.md §5 long-context note).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie

CHI2_MONO = 5.991
HUBER_DELTA = jnp.sqrt(5.991)


class BAProblem(NamedTuple):
    Tcw: jnp.ndarray            # [C,4,4]
    K: jnp.ndarray              # [C,3,3] per-camera intrinsics
    cam_fixed: jnp.ndarray      # [C] bool — frontier / gauge anchors
    cam_valid: jnp.ndarray      # [C] bool
    pts: jnp.ndarray            # [P,3]
    pt_valid: jnp.ndarray       # [P] bool
    obs_cam: jnp.ndarray        # [O] i32
    obs_pt: jnp.ndarray         # [O] i32
    obs_uv: jnp.ndarray         # [O,2]
    obs_inv_sigma2: jnp.ndarray # [O]
    obs_valid: jnp.ndarray      # [O] bool


def build_padded_problem(
    Tcw, K, cam_fixed, pts, obs_cam, obs_pt, obs_uv, obs_inv_sigma2,
    min_cams: int = 4, min_pts: int = 256, min_obs: int = 1024,
) -> "BAProblem":
    """Host helper: assemble a BAProblem with every axis padded to a
    power-of-two bucket (one jit compile per bucket combination)."""
    import numpy as np

    def bucket(n, lo):
        b = lo
        while b < n:
            b *= 2
        return b

    C, P, O = len(Tcw), len(pts), len(obs_cam)
    Cb, Pb, Ob = bucket(C, min_cams), bucket(P, min_pts), bucket(O, min_obs)

    def padr(a, n, fill=0):
        a = np.asarray(a)
        out = np.full((n,) + a.shape[1:], fill, a.dtype)
        out[: len(a)] = a
        return out

    Tcw_p = padr(Tcw, Cb)
    Tcw_p[C:] = np.eye(4)
    K_p = padr(K, Cb)
    K_p[C:] = np.eye(3)
    return BAProblem(
        Tcw=jnp.asarray(Tcw_p, jnp.float32),
        K=jnp.asarray(K_p, jnp.float32),
        cam_fixed=jnp.asarray(padr(cam_fixed, Cb, False)),
        cam_valid=jnp.asarray(np.arange(Cb) < C),
        pts=jnp.asarray(padr(pts, Pb), jnp.float32),
        pt_valid=jnp.asarray(np.arange(Pb) < P),
        obs_cam=jnp.asarray(padr(obs_cam, Ob), jnp.int32),
        obs_pt=jnp.asarray(padr(obs_pt, Ob), jnp.int32),
        obs_uv=jnp.asarray(padr(obs_uv, Ob), jnp.float32),
        obs_inv_sigma2=jnp.asarray(padr(obs_inv_sigma2, Ob, 1), jnp.float32),
        obs_valid=jnp.asarray(np.arange(Ob) < O),
    )


class BAResult(NamedTuple):
    Tcw: jnp.ndarray
    pts: jnp.ndarray
    obs_chi2: jnp.ndarray    # [O] final (unrobust) chi2 per observation
    obs_inlier: jnp.ndarray  # [O] bool (chi2 gate + positive depth)


def _linearize(Tcw, K, pts, p: BAProblem, active):
    """Residuals r [O,2], Jc [O,2,6], Jp [O,2,3], IRLS weights w [O]."""
    Tc = Tcw[p.obs_cam]                       # [O,4,4]
    Kc = K[p.obs_cam]                         # [O,3,3]
    X = pts[p.obs_pt]                         # [O,3]
    pc = jnp.einsum("oij,oj->oi", Tc[:, :3, :3], X) + Tc[:, :3, 3]
    x, y = pc[:, 0], pc[:, 1]
    z = jnp.maximum(pc[:, 2], 1e-6)
    fx, fy = Kc[:, 0, 0], Kc[:, 1, 1]
    u = fx * x / z + Kc[:, 0, 2]
    v = fy * y / z + Kc[:, 1, 2]
    r = jnp.stack([u, v], 1) - p.obs_uv
    zinv = 1.0 / z
    zinv2 = zinv * zinv
    zero = jnp.zeros_like(z)
    Juv = jnp.stack(
        [
            jnp.stack([fx * zinv, zero, -fx * x * zinv2], 1),
            jnp.stack([zero, fy * zinv, -fy * y * zinv2], 1),
        ],
        1,
    )  # [O,2,3] d(uv)/d(pc)
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (pc.shape[0], 3, 3))
    Jpose = jnp.concatenate([-lie.hat(pc), eye3], axis=2)  # [O,3,6]
    Jc = Juv @ Jpose                                       # [O,2,6]
    Jp = Juv @ Tc[:, :3, :3]                               # [O,2,3]
    # gate fixed cameras out of the camera Jacobian (their dofs stay 0)
    free = ~p.cam_fixed[p.obs_cam]
    Jc = Jc * free[:, None, None]
    en = jnp.sqrt(jnp.sum(r * r, 1) * p.obs_inv_sigma2 + 1e-12)
    hub = jnp.where(en <= HUBER_DELTA, 1.0, HUBER_DELTA / en)
    w = p.obs_inv_sigma2 * hub * active
    return r, Jc, Jp, w, z


def _psum(x, axis_name):
    """Cross-device reduction hook: identity single-device, psum over the
    observation-sharded mesh axis (SURVEY.md §5: the server's fusion math
    as device-resident arrays + ICI collectives)."""
    return jax.lax.psum(x, axis_name) if axis_name else x


def _robust_cost(r, inv_sigma2, active, axis_name=None):
    en = jnp.sqrt(jnp.sum(r * r, 1) * inv_sigma2 + 1e-12)
    rho = jnp.where(en <= HUBER_DELTA, en * en, 2 * HUBER_DELTA * en - HUBER_DELTA**2)
    return _psum(jnp.sum(rho * active), axis_name)


def _residual_only(Tcw, K, pts, p: BAProblem):
    Tc = Tcw[p.obs_cam]
    Kc = K[p.obs_cam]
    X = pts[p.obs_pt]
    pc = jnp.einsum("oij,oj->oi", Tc[:, :3, :3], X) + Tc[:, :3, 3]
    z = jnp.maximum(pc[:, 2], 1e-6)
    u = Kc[:, 0, 0] * pc[:, 0] / z + Kc[:, 0, 2]
    v = Kc[:, 1, 1] * pc[:, 1] / z + Kc[:, 1, 2]
    return jnp.stack([u, v], 1) - p.obs_uv, pc[:, 2]


def _inv3x3(M):
    """Batched closed-form 3x3 inverse (adjugate) — avoids linalg.inv
    overhead inside loops."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    adj = jnp.stack(
        [
            jnp.stack([A, B, C], -1),
            jnp.stack([D, E, F], -1),
            jnp.stack([G, H, I], -1),
        ],
        -2,
    )
    return adj / det[..., None, None]


def _common_blocks(r, Jc, Jp, w, p: BAProblem, lam, n_cams, n_pts,
                   axis_name=None):
    """Per-iteration block structure shared by both backends.  With an
    axis_name, the observation axis is device-sharded: each device
    segment-sums its local observations and ONE pytree psum completes
    the [C,6]/[P,3]/[C,6,6]/[P,3,3] reductions over ICI."""
    # gradient
    bc = -jax.ops.segment_sum(
        jnp.einsum("oik,o,oi->ok", Jc, w, r), p.obs_cam, n_cams
    )  # [C,6]
    bp = -jax.ops.segment_sum(
        jnp.einsum("oik,o,oi->ok", Jp, w, r), p.obs_pt, n_pts
    )  # [P,3]
    # Hessian diagonal blocks
    Hcc = jax.ops.segment_sum(
        jnp.einsum("oik,o,oil->okl", Jc, w, Jc), p.obs_cam, n_cams
    )  # [C,6,6]
    Hpp = jax.ops.segment_sum(
        jnp.einsum("oik,o,oil->okl", Jp, w, Jp), p.obs_pt, n_pts
    )  # [P,3,3]
    bc, bp, Hcc, Hpp = _psum((bc, bp, Hcc, Hpp), axis_name)
    # LM damping: H + lam*diag(H), multiplicative for scale invariance
    eye6 = jnp.eye(6, dtype=Hcc.dtype)
    eye3 = jnp.eye(3, dtype=Hcc.dtype)
    dHcc = Hcc + (lam * jnp.diagonal(Hcc, axis1=1, axis2=2))[..., None] * eye6[None]
    dHpp = Hpp + (lam * jnp.diagonal(Hpp, axis1=1, axis2=2))[..., None] * eye3[None]
    # anchor fixed/invalid cameras and dead points with identity blocks
    anchored = p.cam_fixed | ~p.cam_valid
    dHcc = jnp.where(anchored[:, None, None], eye6[None], dHcc) + 1e-8 * eye6[None]
    dead_pt = ~p.pt_valid
    dHpp = jnp.where(dead_pt[:, None, None], eye3[None], dHpp) + 1e-9 * eye3[None]
    Hpp_inv = _inv3x3(dHpp)
    return bc, bp, dHcc, Hpp_inv


def _dense_schur_solve(r, Jc, Jp, w, p: BAProblem, lam, n_cams, n_pts):
    bc, bp, dHcc, Hpp_inv = _common_blocks(r, Jc, Jp, w, p, lam, n_cams, n_pts)
    # W[p,c] = sum_obs Jc^T W Jp : [P,C,6,3] scatter-add
    Wpc = jnp.zeros((n_pts, n_cams, 6, 3), r.dtype)
    blocks = jnp.einsum("oik,o,oil->okl", Jc, w, Jp)  # [O,6,3]
    Wpc = Wpc.at[p.obs_pt, p.obs_cam].add(blocks)
    Y = jnp.einsum("pcij,pjk->pcik", Wpc, Hpp_inv)    # [P,C,6,3]
    S = jnp.zeros((n_cams, 6, n_cams, 6), r.dtype)
    S = S.at[jnp.arange(n_cams), :, jnp.arange(n_cams), :].add(dHcc)
    S = S - jnp.einsum("pcij,pdkj->cidk", Y, Wpc)
    b_s = bc - jnp.einsum("pcij,pj->ci", Y, bp)
    dxc = jnp.linalg.solve(
        S.reshape(n_cams * 6, n_cams * 6), b_s.reshape(-1)
    ).reshape(n_cams, 6)
    dxp = jnp.einsum(
        "pjk,pk->pj", Hpp_inv, bp - jnp.einsum("pcij,ci->pj", Wpc, dxc)
    )
    return dxc, dxp


def _cg_schur_solve(
    r, Jc, Jp, w, p: BAProblem, lam, n_cams, n_pts, cg_iters: int,
    axis_name=None,
):
    bc, bp, dHcc, Hpp_inv = _common_blocks(
        r, Jc, Jp, w, p, lam, n_cams, n_pts, axis_name)

    def Wt_v(v):  # [C,6] -> [P,3] :  W^T v
        t = jnp.einsum("oik,ok->oi", Jc, v[p.obs_cam])
        contr = jnp.einsum("oik,o,oi->ok", Jp, w, t)
        return _psum(jax.ops.segment_sum(contr, p.obs_pt, n_pts), axis_name)

    def W_y(y):  # [P,3] -> [C,6] :  W y
        t = jnp.einsum("oik,ok->oi", Jp, y[p.obs_pt])
        contr = jnp.einsum("oik,o,oi->ok", Jc, w, t)
        return _psum(jax.ops.segment_sum(contr, p.obs_cam, n_cams), axis_name)

    def S_mv(v):
        hv = jnp.einsum("cij,cj->ci", dHcc, v)
        y = jnp.einsum("pjk,pk->pj", Hpp_inv, Wt_v(v))
        return hv - W_y(y)

    Minv = _6x6_inv(dHcc)

    b_s = bc - W_y(jnp.einsum("pjk,pk->pj", Hpp_inv, bp))

    def precond(x):
        return jnp.einsum("cij,cj->ci", Minv, x)

    x = jnp.zeros_like(b_s)
    rr = b_s - S_mv(x)
    zz = precond(rr)
    pp = zz
    rz = jnp.sum(rr * zz)

    def body(_, carry):
        x, rr, pp, rz = carry
        Ap = S_mv(pp)
        alpha = rz / jnp.maximum(jnp.sum(pp * Ap), 1e-12)
        x = x + alpha * pp
        rr = rr - alpha * Ap
        zz = precond(rr)
        rz_new = jnp.sum(rr * zz)
        beta = rz_new / jnp.maximum(rz, 1e-12)
        pp = zz + beta * pp
        return x, rr, pp, rz_new

    x, _, _, _ = jax.lax.fori_loop(0, cg_iters, body, (x, rr, pp, rz))
    dxc = x
    dxp = jnp.einsum("pjk,pk->pj", Hpp_inv, bp - Wt_v(dxc))
    return dxc, dxp


def _6x6_inv(H):
    return jnp.linalg.inv(H)


def _bundle_adjust_impl(
    p: BAProblem,
    iters_a: int,
    iters_b: int,
    chi2_th: float,
    mode: str,
    cg_iters: int,
    axis_name: str | None = None,
) -> BAResult:
    """Two-phase BA mirroring the reference schedule: iters_a LM steps,
    chi-square outlier pruning, iters_b more steps, final classification.
    With axis_name set, the obs_* arrays are the device-local shard and
    camera/point state is replicated — psums complete every reduction, so
    all devices take identical LM steps."""
    n_cams = p.Tcw.shape[0]
    n_pts = p.pts.shape[0]
    solver = (
        functools.partial(_dense_schur_solve)
        if mode == "dense"
        else functools.partial(_cg_schur_solve, cg_iters=cg_iters,
                               axis_name=axis_name)
    )

    def lm_phase(Tcw, pts, active, iters):
        def body(_, carry):
            Tcw, pts, lam = carry
            r, Jc, Jp, w, _z = _linearize(Tcw, p.K, pts, p, active)
            dxc, dxp = solver(r, Jc, Jp, w, p, lam, n_cams, n_pts)
            # guard fixed cams / dead points
            dxc = dxc * (~(p.cam_fixed | ~p.cam_valid))[:, None]
            dxp = dxp * p.pt_valid[:, None]
            Tcw_new = lie.se3_exp(dxc) @ Tcw
            pts_new = pts + dxp
            r_new, _ = _residual_only(Tcw_new, p.K, pts_new, p)
            c_old = _robust_cost(r, p.obs_inv_sigma2, active, axis_name)
            c_new = _robust_cost(r_new, p.obs_inv_sigma2, active, axis_name)
            ok = c_new < c_old
            Tcw = jnp.where(ok, Tcw_new, Tcw)
            pts = jnp.where(ok, pts_new, pts)
            lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 4.0), 1e-8, 1e8)
            return Tcw, pts, lam

        Tcw, pts, _ = jax.lax.fori_loop(
            0, iters, body, (Tcw, pts, jnp.asarray(1e-4, Tcw.dtype))
        )
        return Tcw, pts

    active0 = p.obs_valid.astype(p.Tcw.dtype)
    Tcw, pts = lm_phase(p.Tcw, p.pts, active0, iters_a)
    r, z = _residual_only(Tcw, p.K, pts, p)
    chi2 = jnp.sum(r * r, 1) * p.obs_inv_sigma2
    keep = p.obs_valid & (chi2 <= chi2_th) & (z > 0)
    Tcw, pts = lm_phase(Tcw, pts, keep.astype(p.Tcw.dtype), iters_b)
    r, z = _residual_only(Tcw, p.K, pts, p)
    chi2 = jnp.sum(r * r, 1) * p.obs_inv_sigma2
    inlier = p.obs_valid & (chi2 <= chi2_th) & (z > 0)
    return BAResult(Tcw=Tcw, pts=pts, obs_chi2=chi2, obs_inlier=inlier)


@functools.partial(
    jax.jit, static_argnames=("iters_a", "iters_b", "mode", "cg_iters", "chi2_th")
)
def bundle_adjust(
    p: BAProblem,
    iters_a: int = 5,
    iters_b: int = 10,
    chi2_th: float = CHI2_MONO,
    mode: str = "dense",
    cg_iters: int = 32,
) -> BAResult:
    return _bundle_adjust_impl(p, iters_a, iters_b, chi2_th, mode, cg_iters)


def bundle_adjust_sharded(
    p: BAProblem,
    mesh,
    iters_a: int = 5,
    iters_b: int = 10,
    chi2_th: float = CHI2_MONO,
    cg_iters: int = 32,
) -> BAResult:
    """Observation-sharded global BA over a device mesh (SURVEY.md §5:
    the server's joint optimization as device-resident arrays sharded
    across TPU cores with ICI collectives).

    Sharding layout: obs_* split along the mesh's first axis (the COO
    table is the big axis — 100k+ observations at campaign scale);
    camera/point state replicates.  Each LM iteration's segment-sums
    reduce locally then psum (one pytree collective for the blocks, two
    per CG iteration for the Schur matvecs).  Identical math to
    bundle_adjust(mode="cg"): every device sees the same replicated
    state, so the fori_loop control flow stays in lockstep.

    The obs axis must divide the device count — build_padded_problem's
    power-of-two buckets guarantee that for power-of-two meshes."""
    n_dev = mesh.devices.size
    if p.obs_cam.shape[0] % n_dev:
        raise ValueError(
            f"obs axis {p.obs_cam.shape[0]} must divide mesh size {n_dev}")
    return _sharded_ba_fn(mesh, iters_a, iters_b, chi2_th, cg_iters)(p)


@functools.lru_cache(maxsize=32)
def _sharded_ba_fn(mesh, iters_a, iters_b, chi2_th, cg_iters):
    """Cached shard_map+jit construction — rebuilding the wrapper per
    call would defeat the jit cache and recompile every GBA pass."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    axis = mesh.axis_names[0]
    rep, sh = P(), P(axis)
    in_specs = BAProblem(
        Tcw=rep, K=rep, cam_fixed=rep, cam_valid=rep, pts=rep, pt_valid=rep,
        obs_cam=sh, obs_pt=sh, obs_uv=sh, obs_inv_sigma2=sh, obs_valid=sh,
    )
    out_specs = BAResult(Tcw=rep, pts=rep, obs_chi2=sh, obs_inlier=sh)
    fn = shard_map(
        functools.partial(
            _bundle_adjust_impl, iters_a=iters_a, iters_b=iters_b,
            chi2_th=chi2_th, mode="cg", cg_iters=cg_iters, axis_name=axis,
        ),
        mesh=mesh, in_specs=(in_specs,), out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(fn)
