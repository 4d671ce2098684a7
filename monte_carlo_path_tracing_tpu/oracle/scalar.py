"""Independent scalar oracle: pure NumPy float64 RECURSIVE renderer.

This is the missing rung of the correctness ladder called for by SURVEY.md
§7 layer 10: a from-scratch re-derivation of the reference's three recursive
estimators that shares NO code with the JAX wavefront (different language,
different arithmetic, different control flow — true recursion, f64), so a
statistical match between the two is evidence of estimator correctness
rather than of shared bugs.

Mirrors the reference call-for-call:

  - ``shade_mis``   = shade_with_mis   (/root/reference/main.cpp:402-494),
    INCLUDING the occluded-blocker recursion of the light strategy
    (main.cpp:455-464: the light ray's nearest hit is shaded recursively
    whatever it is) — the branch the wavefront restructures per quirk Q11.
    ``blocker_recursion=False`` switches to the wavefront's NEE
    restructure so the two designs can be compared on equal footing and
    the Q11 estimator difference can be *measured* (docs/PARITY.md).
  - ``shade_split`` = shade            (main.cpp:269-344), including the
    Q3 measure-mix bug behind ``measure_bug`` (main.cpp:313-314).
  - ``shade_brdf``  = shade_with_brdf  (main.cpp:348-399).
  - Phong BRDF eval/sample/pdf          (BRDF.cpp:17-133), with the Q4
    branch-pdf behaviour behind ``branch_pdf``.
  - Arvo spherical-triangle light sampling, stateless prepare+sample+eval
    (Mylight.cpp:322-493) with the reference's exact culls, winding fix,
    and degenerate dummy sample.
  - Uniform area-light sampling         (Mylight.cpp:102-160).
  - Brute-force nearest-hit with triangle-id self-exclusion (quirk Q8) and
    the reference accept rules (Myobj.cpp:165-192; the grid-DDA of
    Myobj.cpp:334-474 is an accelerator over the same predicate, and the
    repo separately proves grid == brute force in tests/test_grid.py).

RNG: a ``numpy.random.Generator`` threaded through the recursion (the
reference's wall-clock re-seeding, quirk Q1, is a bug, not a behavior to
replicate; agreement with the wavefront is asserted on MEANS, not streams).
"""

from __future__ import annotations

import math

import numpy as np

EPS = 1e-8          # reference vec.h:7
P_RR = 0.6          # reference main.cpp:321,375,429


def _norm(v):
    n = math.sqrt(float(v @ v))
    return v / n if n > 0 else v


class ScalarOracle:
    def __init__(
        self,
        scene,
        estimator: str = "mis",
        light_sampler: str = "spherical_triangle",
        rr_prob: float = P_RR,
        blocker_recursion: bool = True,
        ref_mis_weights: bool = True,
        branch_pdf: bool = True,
        measure_bug: bool = True,
        max_depth: int = 64,
    ):
        f64 = lambda a: np.asarray(a, np.float64)
        self.v0 = f64(scene.tri_v0)
        self.e1 = f64(scene.tri_e1)
        self.e2 = f64(scene.tri_e2)
        self.vn = f64(scene.tri_vn)          # [T,3,3] unit vertex normals
        self.geo_n = f64(scene.geo_n)        # [T,3] vote-oriented normals
        mat = np.asarray(scene.tri_mat_id)
        self.kd = f64(scene.materials.kd)[mat]
        self.ks = f64(scene.materials.ks)[mat]
        self.ns = f64(scene.materials.ns)[mat]
        self.emission = f64(scene.materials.emission)[mat]
        self.is_light = np.asarray(scene.is_light)
        self.light_tris = np.asarray(scene.light_tri_ids)
        self.light_area = f64(scene.light_area)
        self.light_class = np.asarray(scene.light_class)

        self.estimator = estimator
        self.spherical = light_sampler == "spherical_triangle"
        self.rr = float(rr_prob)
        self.blocker_recursion = blocker_recursion
        self.ref_mis_weights = ref_mis_weights
        self.branch_pdf = branch_pdf
        self.measure_bug = measure_bug
        self.max_depth = max_depth
        self.chain_events = 0  # blocker events seen by the last trace*()

    # ------------------------------------------------------------------
    # Intersection (Myobj.cpp:165-192 accept rules; brute-force nearest)
    # ------------------------------------------------------------------

    def _nearest(self, ro, rd, excl, tris=None):
        """Nearest accepted hit id and (beta, gamma, t); -1 if none."""
        v0 = self.v0 if tris is None else self.v0[tris]
        e1 = self.e1 if tris is None else self.e1[tris]
        e2 = self.e2 if tris is None else self.e2[tris]
        # Cramer determinants (reference det(a-b, a-c, rd) form == MT).
        pvec = np.cross(np.broadcast_to(rd, e2.shape), e2)
        det = np.einsum("ij,ij->i", pvec, e1)
        s = ro - v0
        beta = np.einsum("ij,ij->i", s, pvec)
        qvec = np.cross(s, e1)
        gamma = qvec @ rd
        t = np.einsum("ij,ij->i", e2, qvec)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = np.where(np.abs(det) >= EPS, 1.0 / np.where(det == 0, 1, det), 0.0)
        beta, gamma, t = beta * inv, gamma * inv, t * inv
        ok = (
            (np.abs(det) >= EPS)
            & (beta >= 0) & (gamma >= 0) & (beta + gamma <= 1)
            & (t >= 0) & (np.abs(t) >= EPS)
        )
        ids = np.arange(len(self.v0)) if tris is None else tris
        ok &= ids != excl
        if not ok.any():
            return -1, 0.0, 0.0, 0.0
        t_masked = np.where(ok, t, np.inf)
        k = int(np.argmin(t_masked))
        return int(ids[k]), float(beta[k]), float(gamma[k]), float(t[k])

    def _hit_point_normal(self, tri, beta, gamma):
        p = (
            self.v0[tri]
            + beta * self.e1[tri]
            + gamma * self.e2[tri]
        )
        a = 1.0 - beta - gamma
        n = _norm(
            a * self.vn[tri, 0] + beta * self.vn[tri, 1] + gamma * self.vn[tri, 2]
        )
        return p, n

    # ------------------------------------------------------------------
    # Phong BRDF (BRDF.cpp:17-133)
    # ------------------------------------------------------------------

    def _brdf_eval(self, n, wi, wo, tri):
        r = 2.0 * float(wi @ n) * n - wi          # reflect(wi, n)
        f = self.kd[tri] / math.pi
        c = float(wo @ r)
        if c > 0:
            ns = self.ns[tri]
            f = f + self.ks[tri] * ((ns + 1) * c**ns / (2 * math.pi))
        return f

    def _brdf_pdf(self, n, wi, wo, tri):
        d = float(self.kd[tri].mean())
        s = float(self.ks[tri].mean())
        tot = d + s
        pd = d / tot if tot > 0 else 1.0
        ps = 1.0 - pd
        cos_n = float(wi @ n)
        p = pd * (cos_n / math.pi if cos_n >= 0 else 0.0)
        r = 2.0 * float(wo @ n) * n - wo
        r = _norm(r)
        cos_r = float(wi @ r)
        if cos_r >= 0:
            ns = self.ns[tri]
            p += ps * (ns + 1) / (2 * math.pi) * cos_r**ns
        return p

    def _frame(self, axis):
        """Reference frame construction (BRDF.cpp:56-67): nx = axis x X
        unless axis ~ X, then axis x Y."""
        x = np.array([1.0, 0.0, 0.0])
        if abs(float(axis @ x) - 1.0) > EPS:
            nx = _norm(np.cross(axis, x))
        else:
            nx = _norm(np.cross(axis, np.array([0.0, 1.0, 0.0])))
        ny = _norm(np.cross(axis, nx))
        return nx, ny

    def _brdf_sample(self, rng, n, wo, tri):
        d = float(self.kd[tri].mean())
        s = float(self.ks[tri].mean())
        tot = d + s
        pd = d / tot if tot > 0 else 1.0
        pick_spec = rng.random() >= pd
        xi1, xi2 = rng.random(), rng.random()
        phi = 2 * math.pi * xi2
        if not pick_spec:
            theta = 0.5 * math.acos(max(-1.0, min(1.0, 1 - 2 * xi1)))
            pdf = pd * math.cos(theta) / math.pi
            axis = n
        else:
            ns = self.ns[tri]
            theta = math.acos(max(-1.0, min(1.0, xi1 ** (1 / (ns + 1)))))
            pdf = (1 - pd) * (ns + 1) / (2 * math.pi) * xi1 ** (ns / (ns + 1))
            axis = _norm(2.0 * float(wo @ n) * n - wo)
        nx, ny = self._frame(axis)
        st = math.sin(theta)
        wi = _norm(
            st * math.cos(phi) * nx + st * math.sin(phi) * ny
            + math.cos(theta) * axis
        )
        if not self.branch_pdf:
            pdf = self._brdf_pdf(n, wi, wo, tri)  # mixture pdf (repo default)
        return wi, pdf

    # ------------------------------------------------------------------
    # Light sampling
    # ------------------------------------------------------------------

    def _arvo_prepare(self, x1, n):
        """Project every light triangle (Mylight.cpp:322-422), vectorized
        over the light set. Returns (records dict of arrays, weights,
        weights_sum, index_map tri->record idx)."""
        tris = self.light_tris
        p0 = self.v0[tris]
        p1 = p0 + self.e1[tris]
        p2 = p0 + self.e2[tris]
        nl = self.geo_n[tris]
        rowdot = lambda a, b: np.einsum("ij,ij->i", a, b)
        unit = lambda v: v / np.maximum(
            np.linalg.norm(v, axis=-1, keepdims=True), 1e-300
        )

        keep = rowdot(nl, x1 - p0) >= EPS          # x1 front of light plane
        tmps = np.stack([ (p - x1) @ n for p in (p0, p1, p2) ])
        keep &= ~np.all(tmps < EPS, axis=0)        # fully below horizon
        A, B, C = unit(p0 - x1), unit(p1 - x1), unit(p2 - x1)
        swap = np.cross(unit(C - A), unit(B - A)) @ n < 0
        Bs = np.where(swap[:, None], C, B)         # Arvo winding fix
        Cs = np.where(swap[:, None], B, C)
        B, C = Bs, Cs
        cl = lambda v: np.clip(v, -1.0, 1.0)
        a = np.arccos(cl(rowdot(B, C)))
        b = np.arccos(cl(rowdot(A, C)))
        c = np.arccos(cl(rowdot(A, B)))
        keep &= (a >= EPS) & (b >= EPS) & (c >= EPS)
        with np.errstate(invalid="ignore", divide="ignore"):
            alpha = np.arccos(cl(-rowdot(unit(np.cross(B, A)), unit(np.cross(A, C)))))
            beta = np.arccos(cl(-rowdot(unit(np.cross(C, B)), unit(np.cross(B, A)))))
            gamma = np.arccos(cl(-rowdot(unit(np.cross(A, C)), unit(np.cross(C, B)))))
        keep &= (alpha >= EPS) & (beta >= EPS) & (gamma >= EPS)
        sA = alpha + beta + gamma - math.pi
        keep &= sA >= 0
        lsum = self.emission[tris].sum(axis=1)
        w = sA * lsum
        keep &= (w >= 0) & np.isfinite(w)

        sel = np.nonzero(keep)[0]
        recs = {
            "A": A[sel], "B": B[sel], "C": C[sel],
            "alpha": alpha[sel], "c": c[sel], "sA": sA[sel],
            "tri": tris[sel], "lsum": lsum[sel],
        }
        imap = {int(t): i for i, t in enumerate(recs["tri"])}
        weights = w[sel]
        return recs, weights, float(weights.sum()), imap

    def _arvo_sample(self, rng, x1, n, recs, weights, wsum):
        """Mylight.cpp:424-482. Returns (tri, point, prob) — tri=-1 encodes
        the reference's dummy below-surface sample (pdf 1)."""
        nrec = len(recs["tri"])
        if nrec == 0 or abs(wsum) < EPS:
            return -1, x1 - n, 1.0
        k = rng.choice(nrec, p=weights / weights.sum())
        A, B, C = recs["A"][k], recs["B"][k], recs["C"][k]
        alpha, c_edge, sA = recs["alpha"][k], recs["c"][k], recs["sA"][k]
        tri, lsum = int(recs["tri"][k]), recs["lsum"][k]
        xi1, xi2 = rng.random(), rng.random()
        sA1 = xi1 * sA
        s = math.sin(sA1 - alpha)
        t = math.cos(sA1 - alpha)
        u = t - math.cos(alpha)
        v = s + math.sin(alpha) * math.cos(c_edge)
        q = ((v * t - u * s) * math.cos(alpha) - v) / ((v * s + u * t) * math.sin(alpha))
        q = max(-1.0, min(1.0, q))
        C1 = _norm(q * A + math.sqrt(max(0.0, 1 - q * q)) * _norm(C - float(C @ A) * A))
        z = 1 - xi2 * (1 - float(C1 @ B))
        z = max(-1.0, min(1.0, z))
        P = _norm(z * B + math.sqrt(max(0.0, 1 - z * z)) * _norm(C1 - float(C1 @ B) * B))
        # Land on the flat triangle (reference re-intersects, Mylight.cpp:475)
        nl = self.geo_n[tri]
        denom = float(nl @ P)
        tpar = float(nl @ (self.v0[tri] - x1)) / denom if abs(denom) > 1e-300 else 0.0
        return tri, x1 + max(tpar, 0.0) * P, lsum / wsum

    def _uniform_sample(self, rng):
        """select_a_point_from_lights (Mylight.cpp:102-160): class by
        radiance sum, triangle by area, barycentric warp; area-measure pdf."""
        lsum = self.emission[self.light_tris].sum(axis=1)   # [L]
        classes = np.unique(self.light_class)
        cw = np.array([
            lsum[self.light_class == c][0] for c in classes
        ])  # per-class radiance sum (constant within a class)
        pc = cw / cw.sum()
        ci = rng.choice(len(classes), p=pc)
        sel = np.nonzero(self.light_class == classes[ci])[0]
        areas = self.light_area[sel]
        pa = areas / areas.sum()
        ai = rng.choice(len(sel), p=pa)
        li = int(sel[ai])
        tri = int(self.light_tris[li])
        xi1, xi2 = rng.random(), rng.random()
        beta = 1 - math.sqrt(1 - xi1)
        gamma = (1 - beta) * xi2
        point = self.v0[tri] + beta * self.e1[tri] + gamma * self.e2[tri]
        prob = float(pc[ci]) * float(pa[ai]) / float(areas[ai])
        return tri, point, prob

    # ------------------------------------------------------------------
    # Estimators
    # ------------------------------------------------------------------

    def shade(self, rng, tri, beta, gamma, wo, depth=0):
        if self.estimator == "mis":
            return self.shade_mis(rng, tri, beta, gamma, wo, depth)
        if self.estimator == "split":
            return self.shade_split(rng, tri, beta, gamma, wo, depth)
        return self.shade_brdf(rng, tri, beta, gamma, wo, depth)

    def _enter(self, tri, beta, gamma, wo):
        """Shared prologue (main.cpp:406-421): backface -> None;
        emissive -> its radiance; else (p, N)."""
        p, N = self._hit_point_normal(tri, beta, gamma)
        if float(N @ wo) < 0:
            return None, None, np.zeros(3)
        if self.is_light[tri]:
            return None, None, self.emission[tri].copy()
        return p, N, None

    def shade_mis(self, rng, tri, beta, gamma, wo, depth=0):
        """main.cpp:402-494 (exact recursion when blocker_recursion and
        ref_mis_weights; the wavefront's Q11 NEE restructure otherwise)."""
        p, N, early = self._enter(tri, beta, gamma, wo)
        if p is None:
            return early
        if depth >= self.max_depth or rng.random() > self.rr:  # RR gates BOTH
            return np.zeros(3)

        L = np.zeros(3)
        recs, weights, wsum, imap = (
            self._arvo_prepare(p, N) if self.spherical else (None, None, 0, None)
        )

        # --- light strategy (main.cpp:440-466) ---
        if self.spherical:
            ltri, x1, lprob = self._arvo_sample(rng, p, N, recs, weights, wsum)
        else:
            ltri, x1, lprob_area = self._uniform_sample(rng)
        wl = _norm(x1 - p)
        if float(wl @ N) > 0:
            if not self.spherical:
                # solid-angle conversion for the restructured comparison
                d2 = float((x1 - p) @ (x1 - p))
                cos_l = float(-wl @ self.geo_n[ltri])
                lprob = lprob_area * d2 / cos_l if cos_l > 0 else 0.0
            htri, hb, hg, ht = self._nearest(p, wl, tri)
            if htri >= 0:
                f = self._brdf_eval(N, wl, wo, tri)
                phong_pdf = self._brdf_pdf(N, wl, wo, tri)
                w = float(wl @ N) / (lprob + phong_pdf) / self.rr
                if self.blocker_recursion:
                    if not self.is_light[htri]:
                        _, n2 = self._hit_point_normal(htri, hb, hg)
                        if float(n2 @ -wl) > 0:
                            self.chain_events += 1
                    # reference: shade WHATEVER the light ray hit
                    child = self.shade_mis(rng, htri, hb, hg, -wl, depth + 1)
                    L = L + child * f * w
                elif htri == ltri and float(-wl @ self.geo_n[ltri]) > 0:
                    # NEE restructure (quirk Q11), mirroring the wavefront's
                    # _nee_term exactly: emissive leaf only, visible iff the
                    # nearest hit IS the sampled triangle and its geometric
                    # normal faces the shading point (cos_l > 0)
                    L = L + self.emission[htri] * f * w

        # --- BRDF strategy (main.cpp:469-491) ---
        wi, bpdf = self._brdf_sample(rng, N, wo, tri)
        if float(wi @ N) < 0:
            return L
        htri, hb, hg, ht = self._nearest(p, wi, tri)
        if htri >= 0:
            f = self._brdf_eval(N, wi, wo, tri)
            if self.ref_mis_weights:
                # nearest LIGHT triangle along wi (Myobj.cpp:476-622)
                lt, _, _, _ = self._nearest(p, wi, tri, tris=self.light_tris)
                if self.spherical:
                    lpdf = (
                        self.emission[lt].sum() / wsum
                        if lt >= 0 and lt in imap and abs(wsum) >= EPS
                        else 0.0
                    )
                else:
                    lpdf = 0.0
                denom = bpdf + lpdf
            else:
                # restructure: continuation by BRDF pdf alone; the emissive
                # hit gets the balance weight instead
                denom = bpdf
            w = float(wi @ N) / denom / self.rr
            if self.ref_mis_weights or not self.is_light[htri]:
                child = self.shade_mis(rng, htri, hb, hg, -wi, depth + 1)
            else:
                # restructured emission weight p_b / (p_b + p_light(hit))
                if self.spherical:
                    lpdf_hit = (
                        self.emission[htri].sum() / wsum
                        if htri in imap and abs(wsum) >= EPS
                        else 0.0
                    )
                else:
                    d2 = ht * ht
                    cos_l = float(-wi @ self.geo_n[htri])
                    li = int(np.nonzero(self.light_tris == htri)[0][0])
                    lsum = self.emission[self.light_tris].sum(axis=1)
                    classes = np.unique(self.light_class)
                    cw = np.array([lsum[self.light_class == c][0] for c in classes])
                    pc = cw[int(np.nonzero(classes == self.light_class[li])[0][0])] / cw.sum()
                    sel = self.light_class == self.light_class[li]
                    pa = self.light_area[li] / self.light_area[sel].sum()
                    p_area = pc * pa / self.light_area[li]
                    lpdf_hit = p_area * d2 / cos_l if cos_l > 0 else 0.0
                child = self.emission[htri] * (bpdf / (bpdf + lpdf_hit))
            L = L + child * f * w
        return L

    def shade_mis_pair(self, rng, tri, beta, gamma, wo, depth=0):
        """Blocker-mode walk returning (L_blocker, L_restructure) evaluated
        on IDENTICAL draws: L_blocker is the reference's exact recursion
        (main.cpp:402-494 incl. the occluded-blocker branch 455-464) and
        L_restructure is the Q11 NEE restructure of the SAME path tree.
        Their difference isolates the blocker-chain contribution with no MC
        stream divergence — the quantity the regen work queue must
        reproduce (tests/test_oracle.py). Requires ref_mis_weights
        semantics (both modes share denominators then)."""
        p, N, early = self._enter(tri, beta, gamma, wo)
        if p is None:
            return early, early.copy()
        if depth >= self.max_depth or rng.random() > self.rr:
            return np.zeros(3), np.zeros(3)

        L_full = np.zeros(3)
        L_rest = np.zeros(3)
        recs, weights, wsum, imap = (
            self._arvo_prepare(p, N) if self.spherical else (None, None, 0, None)
        )

        # --- light strategy ---
        if self.spherical:
            ltri, x1, lprob = self._arvo_sample(rng, p, N, recs, weights, wsum)
        else:
            ltri, x1, lprob_area = self._uniform_sample(rng)
        wl = _norm(x1 - p)
        if float(wl @ N) > 0:
            if not self.spherical:
                d2 = float((x1 - p) @ (x1 - p))
                cos_l = float(-wl @ self.geo_n[ltri])
                lprob = lprob_area * d2 / cos_l if cos_l > 0 else 0.0
            htri, hb, hg, ht = self._nearest(p, wl, tri)
            if htri >= 0:
                f = self._brdf_eval(N, wl, wo, tri)
                phong_pdf = self._brdf_pdf(N, wl, wo, tri)
                w = float(wl @ N) / (lprob + phong_pdf) / self.rr
                if not self.is_light[htri]:
                    # blocker event — counted iff the wavefront would spawn
                    # a chain (regen._nee_full: front non-emissive hit)
                    _, n2 = self._hit_point_normal(htri, hb, hg)
                    if float(n2 @ -wl) > 0:
                        self.chain_events += 1
                child_full, _ = self.shade_mis_pair(rng, htri, hb, hg, -wl,
                                                    depth + 1)
                L_full = L_full + child_full * f * w
                if htri == ltri and float(-wl @ self.geo_n[ltri]) > 0:
                    L_rest = L_rest + self.emission[htri] * f * w

        # --- BRDF strategy (identical in both modes; recurse the pair) ---
        wi, bpdf = self._brdf_sample(rng, N, wo, tri)
        if float(wi @ N) < 0:
            return L_full, L_rest
        htri, hb, hg, ht = self._nearest(p, wi, tri)
        if htri >= 0:
            f = self._brdf_eval(N, wi, wo, tri)
            lt, _, _, _ = self._nearest(p, wi, tri, tris=self.light_tris)
            if self.spherical:
                lpdf = (
                    self.emission[lt].sum() / wsum
                    if lt >= 0 and lt in imap and abs(wsum) >= EPS
                    else 0.0
                )
            else:
                lpdf = 0.0
            w = float(wi @ N) / (bpdf + lpdf) / self.rr
            child_full, child_rest = self.shade_mis_pair(rng, htri, hb, hg,
                                                         -wi, depth + 1)
            L_full = L_full + child_full * f * w
            L_rest = L_rest + child_rest * f * w
        return L_full, L_rest

    def trace_pair(self, rng, ro, rd, spp: int):
        """Per-ray means of (blocker, restructure) on identical draws.
        Also resets/accumulates ``self.chain_events`` — the number of
        blocker events (spawned chains), for rate parity with the
        wavefront queue's RegenStats.chains."""
        ro = np.asarray(ro, np.float64)
        rd = np.asarray(rd, np.float64)
        self.chain_events = 0
        out_f = np.zeros((len(ro), 3))
        out_r = np.zeros((len(ro), 3))
        for i in range(len(ro)):
            tri, b, g, _ = self._nearest(ro[i], rd[i], -1)
            if tri < 0:
                continue
            af = np.zeros(3)
            ar = np.zeros(3)
            for _ in range(spp):
                lf, lr = self.shade_mis_pair(rng, tri, b, g, -rd[i])
                af += lf
                ar += lr
            out_f[i] = af / spp
            out_r[i] = ar / spp
        return out_f, out_r

    def shade_split(self, rng, tri, beta, gamma, wo, depth=0):
        """main.cpp:269-344."""
        p, N, early = self._enter(tri, beta, gamma, wo)
        if p is None:
            return early

        L_dir = np.zeros(3)
        if self.spherical:
            recs, weights, wsum, _ = self._arvo_prepare(p, N)
            ltri, x1, lprob = self._arvo_sample(rng, p, N, recs, weights, wsum)
        else:
            ltri, x1, lprob = self._uniform_sample(rng)  # area measure
        if ltri >= 0:
            n1 = self.geo_n[ltri]
            wl = _norm(x1 - p)
            if float(wl @ N) > 0 and float(-wl @ n1) > 0:
                htri, _, _, _ = self._nearest(p, wl, tri)
                if htri == ltri:
                    f = self._brdf_eval(N, wl, wo, tri)
                    d2 = float((x1 - p) @ (x1 - p))
                    if not self.spherical or self.measure_bug:
                        # area-form G (main.cpp:313-314) — correct for the
                        # uniform sampler, the Q3 bug for the spherical one
                        g = float(wl @ N) * float(-wl @ n1) / d2
                    else:
                        g = float(wl @ N)  # solid-angle-correct pairing
                    L_dir = self.emission[ltri] * f * (g / lprob)

        if depth >= self.max_depth or rng.random() > self.rr:
            return L_dir
        wi, bpdf = self._brdf_sample(rng, N, wo, tri)
        if float(wi @ N) < 0:
            return L_dir
        htri, hb, hg, _ = self._nearest(p, wi, tri)
        if htri >= 0 and not self.is_light[htri]:   # light hits discarded
            f = self._brdf_eval(N, wi, wo, tri)
            child = self.shade_split(rng, htri, hb, hg, -wi, depth + 1)
            L_dir = L_dir + child * f * (float(wi @ N) / bpdf / self.rr)
        return L_dir

    def shade_brdf(self, rng, tri, beta, gamma, wo, depth=0):
        """main.cpp:348-399."""
        p, N, early = self._enter(tri, beta, gamma, wo)
        if p is None:
            return early
        if depth >= self.max_depth or rng.random() > self.rr:
            return np.zeros(3)
        wi, bpdf = self._brdf_sample(rng, N, wo, tri)
        if float(wi @ N) < 0:
            return np.zeros(3)
        htri, hb, hg, _ = self._nearest(p, wi, tri)
        if htri < 0:
            return np.zeros(3)
        f = self._brdf_eval(N, wi, wo, tri)
        child = self.shade_brdf(rng, htri, hb, hg, -wi, depth + 1)
        return child * f * (float(wi @ N) / bpdf / self.rr)

    # ------------------------------------------------------------------
    # Driver
    # ------------------------------------------------------------------

    def trace(self, rng, ro, rd, spp: int):
        """Mean radiance of `spp` independent paths for each ray (the
        reference's per-pixel loop, main.cpp:567-576). Resets/accumulates
        ``self.chain_events`` (blocker mode)."""
        ro = np.asarray(ro, np.float64)
        rd = np.asarray(rd, np.float64)
        self.chain_events = 0
        out = np.zeros((len(ro), 3))
        for i in range(len(ro)):
            tri, b, g, _ = self._nearest(ro[i], rd[i], -1)
            if tri < 0:
                continue
            acc = np.zeros(3)
            for _ in range(spp):
                acc += self.shade(rng, tri, b, g, -rd[i])
            out[i] = acc / spp
        return out
