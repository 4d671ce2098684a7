"""Legacy `shoot` integrator (reference main.cpp:96-265, component C17).

The reference's first estimator design — a path tracer that accumulates the
*path pdf* into an out-parameter ``px`` and shades with **Blinn-Phong**
(``kd*(N.L) + ks*(H.N)^ns``, main.cpp:250-254) on the way back up the
recursion, importance-sampling the bounce direction from the *joint*
diffuse+specular CDF ``F(theta)`` inverted by Newton iteration
(inverse_F_theta, main.cpp:32-55) with a Simpson-rule normalisation constant
``M`` (cal_M, main.cpp:75-86) and horizon rejection (main.cpp:215-222).
All call sites are commented out and the author marks it a failed design
(main.cpp:88, "shoot函数失败的设计" noted in SURVEY.md Q12); it is
implemented here for component-inventory completeness and exposed as
``estimator="shoot"`` — not part of any golden/benchmark path.

Estimator contract (from the commented driver, main.cpp:522-536, 571):
one sample = ``shoot(eye, dir, px=1, ...)``, final value ``I / px`` (the
driver's extra ``0.01`` probe scale is not reproduced). Per-vertex recursion
(main.cpp:96-265):

  1. trace; miss -> 0 (100-102); backface ``N.(-w) < 0`` -> 0 (107-112)
  2. q = mean of the six Kd/Ks components, clamped to 1 (124-125)
  3. ksi >= q  -> TERMINATE: uniform-area light sample (C8), px *= lp.prob;
     Ii = lp.I if the light is above the horizon and the shadow ray's
     nearest hit is exactly the sampled triangle, else 0 (134-160)
  4. else CONTINUE: theta ~ Newton-inverted joint CDF, phi ~ U(0,2pi);
     frame about the mirror direction R (185-206); horizon rejection
     ``while theta > theta0`` only when phi in (0, pi) (212-222);
     px *= (x + y cos^n th) sin th / (2pi (x + y/(n+1))) * M  (231-235);
     Ii = shoot(x1, v) / q                                    (238)
  5. return Ii * (kd*(N.L) + ks*(H.N)^ns)                     (250-254)

Wavefront form: the recursion is a chain (never a tree), so it maps to the
same bounded ``fori_loop`` + mask structure as the other estimators
(wavefront.py): a throughput carry absorbs the per-vertex Blinn-Phong
factor and the 1/q, and the terminal light event adds
``tp * factor(L=wl) * Ii``. The unbounded rejection loop is capped at
``_MAX_REJECT`` resamples (the reference's can spin forever when
``theta0 <= 0`` — one reason the design was abandoned); Newton runs a fixed
``_NEWTON_ITERS`` iterations with convergence freeze, f32-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from monte_carlo_path_tracing_tpu.core import rng, vecmath as vm
from monte_carlo_path_tracing_tpu.integrator import common
from monte_carlo_path_tracing_tpu.ops import intersect as ops_intersect
from monte_carlo_path_tracing_tpu.sampling import light_uniform
from monte_carlo_path_tracing_tpu.scene.types import Scene
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig

_SG = jax.lax.stop_gradient

_NEWTON_ITERS = 24
_MAX_REJECT = 16
_SIMPSON_N = 100        # intervals (cal_M, main.cpp:77)
_EPS = 1e-8             # reference eps (vec.h:7, main.cpp:59)

# Extra purpose tags, offset past core/rng.py's to stay decorrelated.
_P_Q = 16               # continue-vs-terminate draw (main.cpp:131)
_P_THETA = 17           # ksi1 stream incl. rejection resamples (171, 219)
_P_PHI = 18             # ksi2 (175)


def _inverse_F_theta(x, y, n, ksi):
    """Newton inversion of the joint CDF (inverse_F_theta, main.cpp:32-55).

    F(th) = 1 - [x(n+1) cos th + y cos^{n+1} th] / (x(n+1) + y); solve
    F(th) = ksi. F is monotone on [0, pi/2] (F(0)=0, F(pi/2)=1). Vectorised
    fixed-iteration Newton from th=pi/4 with per-lane convergence freeze;
    th clamped into (0, pi/2] so cos stays >= 0 in f32 (the reference's
    unclamped f64 loop can overshoot — another abandoned-design wart).
    """
    denom = jnp.maximum(x * (n + 1.0) + y, 1e-20)

    def body(_, th):
        # f32 cos(pi/2) is a tiny NEGATIVE number; a negative base under a
        # fractional exponent is NaN, so clamp.
        c = jnp.maximum(jnp.cos(th), 0.0)
        F = 1.0 - ksi - (x * (n + 1.0) * c + y * c ** (n + 1.0)) / denom
        f = (n + 1.0) * jnp.sin(th) * (x + y * c ** n) / denom
        step = F / jnp.maximum(f, 1e-12)
        th_new = jnp.clip(th - step, 1e-6, 0.5 * jnp.pi)
        return jnp.where(jnp.abs(F) < 1e-7, th, th_new)

    th = jax.lax.fori_loop(
        0, _NEWTON_ITERS, body, jnp.full_like(ksi, 0.25 * jnp.pi)
    )
    # Endpoint handling (main.cpp:35-38).
    th = jnp.where(ksi <= 0.0, 0.0, th)
    th = jnp.where(ksi >= 1.0, 0.5 * jnp.pi, th)
    return th


def _theta0(a1, a2, a3, phi):
    """Horizon angle in the R-frame (cal_theta0, main.cpp:57-64)."""
    d = a1 * jnp.cos(phi) + a2 * jnp.sin(phi)
    degenerate = (jnp.abs(a1) < _EPS) & (jnp.abs(a2) < _EPS)
    th0 = jnp.arctan(-a3 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d))
    return jnp.where(degenerate, 0.5 * jnp.pi, th0)


def _cal_M(x, y, n, a1, a2, a3):
    """Simpson normalisation constant (cal_M, main.cpp:75-86):
    M = 1 / (1 - c2 * S), c2 = 1/(2pi(x + y/(n+1))),
    S = int_0^pi [x cos th0(phi) + y cos^{n+1} th0(phi)/(n+1)] dphi.
    Batched: [N] lanes x [3*_SIMPSON_N] phi evaluations.
    """
    h = jnp.pi / _SIMPSON_N
    i = jnp.arange(_SIMPSON_N, dtype=jnp.float32)
    # Simpson nodes per interval: left, mid, right with weights 1,4,1 (h/6).
    phis = jnp.concatenate([i * h, (i + 0.5) * h, (i + 1.0) * h])      # [3K]
    wts = jnp.concatenate(
        [jnp.full_like(i, h / 6.0), jnp.full_like(i, 4.0 * h / 6.0),
         jnp.full_like(i, h / 6.0)]
    )
    th0 = _theta0(a1[:, None], a2[:, None], a3[:, None], phis[None, :])
    c0 = jnp.maximum(jnp.cos(th0), 0.0)   # f32 cos(pi/2) < 0 => NaN under pow
    f = x[:, None] * c0 + y[:, None] * c0 ** (n[:, None] + 1.0) / (n[:, None] + 1.0)
    S = jnp.sum(f * wts[None, :], axis=-1)                              # [N]
    c2 = 1.0 / jnp.maximum(2.0 * jnp.pi * (x + y / (n + 1.0)), 1e-20)
    return 1.0 / jnp.maximum(1.0 - c2 * S, 1e-6)


def _r_frame(ns, l):
    """Frame about the mirror direction R (main.cpp:185-206): columns
    (N x l)^, (R x (N x l)^)^, R; degenerate l || N falls back to the
    reference's ad-hoc N-frame (tmp = N + (5,0,0), main.cpp:189-197).
    Returns the three columns of T."""
    nxl = jnp.cross(ns, l)
    # Reference tests |N x l| < 1e-8 in exact f64 (vec::isZero); under f32
    # FMA contraction cross(a, a) lands at ~1e-8, NOT 0, so the threshold
    # must sit above the noise floor. |N x l| = sin(angle) for unit inputs.
    degen = vm.norm(nxl) < 1e-5
    r = vm.normalize(2.0 * vm.dot(ns, l)[:, None] * ns - l)

    tmp = ns + jnp.array([5.0, 0.0, 0.0])
    yv_d = vm.normalize(jnp.cross(ns, tmp))
    xv_d = vm.normalize(jnp.cross(yv_d, ns))

    xv = vm.normalize(nxl)
    r_safe = jnp.where(degen[:, None], ns, r)
    xcol = jnp.where(degen[:, None], xv_d, xv)
    ycol = jnp.where(
        degen[:, None], yv_d, vm.normalize(jnp.cross(r_safe, xcol))
    )
    zcol = r_safe
    return xcol, ycol, zcol


def render_rays_shoot(
    scene: Scene,
    cfg: RenderConfig,
    key: jax.Array,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    with_stats: bool = False,
):
    """Estimate radiance [N,3] per ray with the legacy shoot estimator:
    returns ``I / px`` per the commented driver contract (main.cpp:571).

    with_stats=True additionally returns {"rays", "px", "steps"} — px is the
    raw accumulated path pdf (the reference's out-parameter), steps the
    chain length (its ``step`` counter, main.cpp:98).
    """
    accel = ops_intersect.build_accel(scene)
    tri_to_light = common.light_index_table(scene)
    N = ro.shape[0]
    impl = "pallas" if cfg.use_pallas else ("auto" if cfg.use_pallas is None else "matmul")

    def body(d, st):
        active, ro_c, rd_c, excl, tp, px, L, steps, nrays = st
        hit = ops_intersect.intersect(accel, ro_c, rd_c, excl, impl=impl)
        nrays = nrays + jnp.sum(active.astype(jnp.int32))
        si = common.gather_interaction(scene, hit, rd_c, tri_to_light)
        alive = active & hit.valid & si.front   # miss / backface -> 0 (100-112)
        steps = steps + alive.astype(jnp.int32)

        # q = clamped mean of the six Kd/Ks channels (main.cpp:124-125).
        q = jnp.minimum(
            (jnp.sum(si.kd, axis=-1) + jnp.sum(si.ks, axis=-1)) / 6.0, 1.0
        )
        xi_q = rng.uniform(rng.bounce_key(key, d, _P_Q), (N,))
        terminate = xi_q >= q                    # ksi >= q -> stop (134)

        # ---- Terminal branch: uniform-area light sample (main.cpp:136-159)
        ls = light_uniform.sample(
            rng.bounce_key(key, d, rng.P_LIGHT_SELECT), scene, N
        )
        wl_raw = ls.coord - si.p
        dist = jnp.maximum(vm.norm(wl_raw), 1e-12)
        wl = wl_raw / dist[:, None]
        cos_l = vm.dot(wl, si.ns)
        # Visibility: nearest hit must be exactly the sampled triangle (151).
        sh = ops_intersect.intersect(accel, si.p, wl, si.tri_id, impl=impl)
        nrays = nrays + jnp.sum((alive & terminate).astype(jnp.int32))
        vis = (cos_l >= 0.0) & sh.valid & (sh.tri_id == ls.tri_id)
        Ii_term = jnp.where(vis[:, None], ls.emission, 0.0)
        # Blinn-Phong factor at THIS vertex with L = light dir (250-254),
        # unclamped as in the reference.
        H_t = vm.normalize(wl + si.wo)
        fac_term = si.kd * cos_l[:, None] + si.ks * (
            jnp.maximum(vm.dot(H_t, si.ns), 0.0) ** si.ns_exp
        )[:, None]
        term_now = alive & terminate
        L = L + jnp.where(term_now[:, None], tp * fac_term * Ii_term, 0.0)
        px = jnp.where(term_now, px * _SG(jnp.maximum(ls.pdf, 1e-30)), px)

        # ---- Continue branch: joint-CDF direction sample (main.cpp:163-241)
        l = si.wo
        cos_nl = vm.dot(si.ns, l)
        x = jnp.sum(si.kd, axis=-1) * cos_nl     # (167)
        y = jnp.sum(si.ks, axis=-1)              # (168)
        n_exp = si.ns_exp

        xcol, ycol, zcol = _r_frame(si.ns, l)
        # na = T^T N (main.cpp:206): rows of T^T are the columns of T.
        a1 = vm.dot(xcol, si.ns)
        a2 = vm.dot(ycol, si.ns)
        a3 = vm.dot(zcol, si.ns)

        xi2 = rng.uniform(rng.bounce_key(key, d, _P_PHI), (N,))
        phi = 2.0 * jnp.pi * xi2
        th0 = _theta0(a1, a2, a3, phi)

        # theta draw + capped horizon rejection (212-222): resample ksi1
        # while theta > theta0, only when phi in (0, pi).
        reject_applies = (phi > 0.0) & (phi < jnp.pi)
        k_th = rng.bounce_key(key, d, _P_THETA)

        def rej_body(t, carry):
            theta, done = carry
            xi1 = rng.uniform(rng.fold_in(k_th, t), (N,))
            cand = _inverse_F_theta(x, y, n_exp, xi1)
            take = ~done
            theta = jnp.where(take, cand, theta)
            done = done | ~(reject_applies & (theta > th0))
            return theta, done

        theta, _ = jax.lax.fori_loop(
            0, _MAX_REJECT, rej_body,
            (jnp.zeros((N,)), jnp.zeros((N,), bool)),
        )

        M = _cal_M(x, y, n_exp, a1, a2, a3)
        cos_t = jnp.maximum(jnp.cos(theta), 0.0)
        prob = (
            (x + y * cos_t ** n_exp) * jnp.sin(theta)
            / jnp.maximum(2.0 * jnp.pi * (x + y / (n_exp + 1.0)), 1e-20) * M
        )

        local = jnp.stack(
            [jnp.sin(theta) * jnp.cos(phi), jnp.sin(theta) * jnp.sin(phi),
             cos_t], axis=-1,
        )
        v = vm.normalize(
            local[:, 0:1] * xcol + local[:, 1:2] * ycol + local[:, 2:3] * zcol
        )

        cont = alive & ~terminate & (prob > 1e-12) & (q > 1e-6)
        px = jnp.where(cont, px * _SG(jnp.maximum(prob, 1e-12)), px)
        # Vertex factor with L = v, plus the 1/q RR weight (238, 250-254).
        H_c = vm.normalize(v + si.wo)
        fac_cont = si.kd * vm.dot(si.ns, v)[:, None] + si.ks * (
            jnp.maximum(vm.dot(H_c, si.ns), 0.0) ** n_exp
        )[:, None]
        tp = jnp.where(
            cont[:, None],
            tp * fac_cont / _SG(jnp.maximum(q, 1e-6))[:, None],
            tp,
        )
        return (cont, si.p, v, hit.tri_id, tp, px, L, steps, nrays)

    init = (
        jnp.ones((N,), bool), ro, rd,
        jnp.full((N,), ops_intersect.NO_HIT, jnp.int32),
        jnp.ones((N, 3)), jnp.ones((N,)), jnp.zeros((N, 3)),
        jnp.zeros((N,), jnp.int32), jnp.zeros((), jnp.int32),
    )
    st = jax.lax.fori_loop(0, cfg.max_depth, body, init)
    _, _, _, _, _, px, L, steps, nrays = st
    out = L / jnp.maximum(px, 1e-30)[:, None]
    if with_stats:
        return out, {"rays": nrays, "px": px, "steps": steps}
    return out
