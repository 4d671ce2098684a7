#!/usr/bin/env python
"""On-device pallas-kernel parity vs the exact matmul path.

Round-4 regression guard: the streamed pallas kernels used to pre-split W
into bf16 hi/lo blocks host-side, and Mosaic silently dropped the lo
contribution — mxu_fast degraded to 1-pass bf16 (~0.3% coefficient error),
flipping nearest-hit ordering between surfaces ~0.1% apart in t (cornell's
emitters vanished from primary hits). CPU tests can't catch Mosaic
lowering bugs (interpret mode was correct), so this script runs the REAL
kernels on the device and checks hit agreement against intersect_matmul.

Disagreements are only allowed where both impls report the same t (exact
shared-edge ties — argmin order differs) or where either pick's EXACT
accept margin is grazing (within ~1e-4 of |det| — the documented mxu_fast
accept-flip fringe: a ~1e-5-relative coefficient error can flip an accept
whose margin is that small, and the replacement hit may be arbitrarily
far behind).

Writes docs/tpu_kernel_parity.json; exits 1 on failure.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from monte_carlo_path_tracing_tpu.integrator.regen import _primary_dirs
from monte_carlo_path_tracing_tpu.ops import intersect as ops_intersect, intersect_ref
from monte_carlo_path_tracing_tpu.render.camera import camera_basis, pixel_len
from monte_carlo_path_tracing_tpu.scene import load_scene


def check_scene(path, res=(96, 64)):
    scene = load_scene(path)
    scene = dataclasses.replace(
        scene,
        camera=dataclasses.replace(scene.camera, width=res[0], height=res[1]),
    )
    cam = scene.camera
    n = res[0] * res[1]
    u_ax, v_ax, n_ax, dist = camera_basis(cam)
    plen = pixel_len(cam, dist)
    ro, rd = _primary_dirs(
        cam, u_ax, v_ax, n_ax, dist, plen, jnp.arange(n, dtype=jnp.int32)
    )
    ex = jnp.full((n,), ops_intersect.NO_HIT, jnp.int32)
    accel = ops_intersect.build_accel(scene)
    hm = ops_intersect.intersect(accel, ro, rd, ex, impl="matmul")
    out = {}
    for mode in ("vpu", "mxu", "mxu_fast"):
        hp = ops_intersect.intersect(accel, ro, rd, ex, impl="pallas", mode=mode)
        vm, vp = np.asarray(hm.valid), np.asarray(hp.valid)
        tm, tp_ = np.asarray(hm.tri_id), np.asarray(hp.tri_id)
        ttm, ttp = np.asarray(hm.t), np.asarray(hp.t)
        both = vm & vp
        dis = both & (tm != tp_)
        # shared-edge ties: same t, different (coplanar) triangle
        tie = dis & (np.abs(ttm - ttp) <= 1e-6 * np.maximum(ttm, 1.0))
        real = dis & ~tie
        # Grazing-accept fringe: evaluate the EXACT margin of both picks;
        # a pick whose (u, v, 1-u-v, t) accept margin is within 1e-4 of
        # |det| can flip under mxu_fast's ~1e-5-relative coefficient noise.
        g64 = np.asarray(
            intersect_ref.ray_features(ro, rd)).astype(np.float64)
        ids_np = np.asarray(accel.tri_ids)
        W64 = np.asarray(accel.W).astype(np.float64)
        pos_of = {int(t): i for i, t in enumerate(ids_np)}

        def rel_margin(ray, tri):
            det, un, vn, tn = g64[ray] @ W64[pos_of[int(tri)]]
            s = np.sign(det) or 1.0
            adet = det * s
            m = min(un * s, vn * s, adet - (un + vn) * s, tn * s)
            return m / max(adet, 1e-300)

        fringe = np.zeros_like(real)
        for ray in np.where(real)[0]:
            if min(rel_margin(ray, tm[ray]), rel_margin(ray, tp_[ray])) <= 1e-4:
                fringe[ray] = True
        bad = int((real & ~fringe).sum())
        out[mode] = {
            "rays": int(n),
            "valid_agree": float((vm == vp).mean()),
            "tri_disagree": int(dis.sum()),
            "edge_ties": int(tie.sum()),
            "fringe": int(fringe.sum()),
            "bad": bad,
        }
        # occlusion parity on shadow-like rays (origins = hit points,
        # directions up): blocked flags must agree except the fringe
        p = np.asarray(ro) + ttm[:, None] * np.asarray(rd) * 0.99
        wl = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
        om = ops_intersect.occluded(
            accel, jnp.asarray(p), wl, jnp.full((n,), 1.0), ex, impl="matmul"
        )
        op = ops_intersect.occluded(
            accel, jnp.asarray(p), wl, jnp.full((n,), 1.0), ex,
            impl="pallas", mode=mode,
        )
        out[mode]["occl_disagree"] = int(
            (np.asarray(om) != np.asarray(op)).sum()
        )
    return out


def main():
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    report = {"device": str(jax.devices()[0]), "scenes": {}}
    ok = True
    for name in ("cornell", "veach-mis", "bathroom"):
        obj = "veach-mis" if "veach" in name else name
        path = os.path.join(here, "scenes", name, f"{obj}.obj")
        r = check_scene(path)
        report["scenes"][name] = r
        for mode, row in r.items():
            if row["bad"] > 0:
                ok = False
        print(name, json.dumps(r), flush=True)
    report["ok"] = ok
    with open(os.path.join(here, "docs", "tpu_kernel_parity.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("OK" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
