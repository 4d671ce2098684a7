#!/usr/bin/env python
"""Round-3 perf attack: MXU radix sort vs XLA argsort, then the regen
renderer end-to-end with lane sorting + tri-tile culling enabled.

Round 2 measured that culling wins per-kernel on coherent tiles (occluded
5.5 -> 2.0 ms) but lost end-to-end because XLA's bitonic argsort costs
~15 ms per 65k-lane iteration. ops/sort.py replaces it with a counting/radix
sort built on an MXU prefix matmul; this script measures (a) the raw sort
cost and (b) the end-to-end effect of cfg.ray_sort + CULL_* at several
sort_every values, on the Veach scene at bench-like settings.

Writes docs/tpu_sort_cull.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import monte_carlo_path_tracing_tpu.ops.intersect as ops
from monte_carlo_path_tracing_tpu.core import rng
from monte_carlo_path_tracing_tpu.integrator.regen import render_regen
from monte_carlo_path_tracing_tpu.ops.sort import sort_perm
from monte_carlo_path_tracing_tpu.scene import load_scene
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig
from monte_carlo_path_tracing_tpu.utils.timing import timed

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "docs", "tpu_sort_cull.json")


def main():
    print("devices:", jax.devices(), flush=True)
    results = {"device": str(jax.devices()[0])}

    # ---- raw sort cost at 65k lanes ----
    C = 1 << 16
    key = np.random.default_rng(0).integers(0, 1 << 24, C).astype(np.int32)
    karr = jnp.asarray(key)

    f_radix = jax.jit(lambda k: sort_perm(k, key_bits=24))
    f_radix16 = jax.jit(lambda k: sort_perm(k >> 8, key_bits=16))
    f_radix8 = jax.jit(lambda k: sort_perm(k >> 16, key_bits=8))
    f_arg = jax.jit(jnp.argsort)
    for name, f in [("radix24", f_radix), ("radix16", f_radix16),
                    ("radix8", f_radix8), ("argsort", f_arg)]:
        dt, out = timed(f, karr, n=30)
        results[f"sort_{name}_ms"] = round(dt * 1e3, 3)
        print(f"{name}: {dt*1e3:.3f} ms", flush=True)

    # verify radix24 == argsort exactly (both ascending, stable)
    np.testing.assert_array_equal(
        key[np.asarray(f_radix(karr))], np.sort(key, kind="stable"))
    print("radix24 output verified against np.sort", flush=True)

    # ---- end-to-end regen: veach 256x256 x 8spp, 65k lanes ----
    scene = load_scene(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "..", "scenes", "veach-mis", "veach-mis.obj"))
    import dataclasses
    scene = dataclasses.replace(
        scene, camera=dataclasses.replace(scene.camera, width=256, height=256))
    n_pix = 256 * 256
    k = rng.base_key(0)

    def bench_cfg(tag, cfg, cn, co):
        ops.CULL_NEAREST, ops.CULL_OCCLUDED = cn, co
        try:
            run = jax.jit(lambda s, kk, tot: render_regen(
                s, cfg, kk, n_pix, tot, lanes=C))
            np.asarray(run(scene, k, jnp.int32(C))[0])      # compile+warm
            t0 = time.perf_counter()
            fb, nrays, iters, _ = run(scene, k, jnp.int32(n_pix * 8))
            cs = float(np.asarray(fb).sum())
            dt = time.perf_counter() - t0
            mrays = float(nrays) / dt / 1e6
            results[tag] = {
                "seconds": round(dt, 3), "mrays": round(mrays, 3),
                "iters": int(iters), "ms_per_iter": round(dt / int(iters) * 1e3, 2),
                "checksum": cs,
            }
            print(f"{tag}: {dt:.3f}s  {mrays:.2f} Mrays/s  "
                  f"{dt/int(iters)*1e3:.2f} ms/iter  checksum={cs:.1f}", flush=True)
        finally:
            ops.CULL_NEAREST = ops.CULL_OCCLUDED = False

    base = RenderConfig(width=256, height=256, spp=8, estimator="mis",
                        light_sampler="spherical_triangle", max_depth=32)
    bench_cfg("regen_baseline", base, False, False)
    for every in (1, 2, 4):
        cfg = base.replace(ray_sort=True, ray_sort_every=every)
        bench_cfg(f"regen_sort{every}_cull", cfg, True, True)
    bench_cfg("regen_sort1_nocull", base.replace(ray_sort=True), False, False)
    bench_cfg("regen_nosort_cull", base, True, True)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
