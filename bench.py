#!/usr/bin/env python
"""Headline benchmark: Veach MIS 1024x1024, MIS + Arvo spherical sampling.

Prints ONE JSON line: {"metric": "Mrays/s/chip", "value": ..., "unit":
"Mrays/s", "vs_baseline": ...}.

Definitions
-----------
- rays   = wavefront trace operations whose lane was live (extend + shadow),
           counted inside the integrator (render_rays with_stats).
- paths  = primary samples = pixels * spp.
- value  = rays / wall_seconds / 1e6 on ONE chip (the benchmark device).
- vs_baseline = our paths/s divided by the reference's 136 paths/s — the
  reference C++ renderer's derived MIS throughput at this scene/estimator
  (BASELINE.md: 9.216e6 paths / 67,500 s). Equal-work comparison: both
  sides count one full RR-terminated MIS path per primary sample.

Env knobs: BENCH_SPP (default 8), BENCH_RES (default 1024), BENCH_CHUNK
(default 2^16), BENCH_ESTIMATOR, BENCH_SCENE.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_PATHS_PER_S = 136.0  # BASELINE.md, reference MIS 1x distance


def main() -> None:
    import jax
    import jax.numpy as jnp

    from monte_carlo_path_tracing_tpu.core import rng
    from monte_carlo_path_tracing_tpu.integrator import render_rays
    from monte_carlo_path_tracing_tpu.render.camera import generate_rays
    from monte_carlo_path_tracing_tpu.scene import load_scene
    from monte_carlo_path_tracing_tpu.utils.config import RenderConfig

    spp = int(os.environ.get("BENCH_SPP", "8"))
    res = int(os.environ.get("BENCH_RES", "1024"))
    chunk = int(os.environ.get("BENCH_CHUNK", str(1 << 16)))
    estimator = os.environ.get("BENCH_ESTIMATOR", "mis")
    scene_path = os.environ.get(
        "BENCH_SCENE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "scenes", "veach-mis", "veach-mis.obj"),
    )

    dev = jax.devices()[0]
    scene = load_scene(scene_path)
    scene = dataclasses.replace(
        scene, camera=dataclasses.replace(scene.camera, width=res, height=res)
    )
    cfg = RenderConfig(
        width=res, height=res, spp=spp, estimator=estimator,
        light_sampler="spherical_triangle", max_depth=16, ray_chunk=chunk,
        seed=0,
    )

    n_pix = res * res
    chunk = min(chunk, n_pix)
    key = rng.base_key(cfg.seed)

    def pass_fn(scene, key, idx, sample_id):
        skey = rng.sample_key(key, sample_id)
        ro, rd = generate_rays(scene.camera, idx)
        rad, stats = render_rays(scene, cfg, skey, ro, rd, with_stats=True)
        return jnp.sum(rad, axis=0), stats["rays"]

    pass_jit = jax.jit(pass_fn)

    idx0 = jnp.arange(chunk, dtype=jnp.int32)
    # Warmup / compile
    out = pass_jit(scene, key, idx0, 0)
    jax.block_until_ready(out)

    pad = (-n_pix) % chunk
    total_rays = 0
    t0 = time.perf_counter()
    acc = None
    for s in range(spp):
        for c0 in range(0, n_pix + pad, chunk):
            idx = jnp.arange(c0, c0 + chunk, dtype=jnp.int32) % n_pix
            rad_sum, nrays = pass_jit(scene, key, idx, s)
            total_rays += int(nrays)
            acc = rad_sum if acc is None else acc + rad_sum
    jax.block_until_ready(acc)
    dt = time.perf_counter() - t0

    paths = (n_pix + pad) * spp
    mrays = total_rays / dt / 1e6
    paths_per_s = paths / dt
    result = {
        "metric": "Mrays/s/chip",
        "value": round(mrays, 4),
        "unit": "Mrays/s",
        "vs_baseline": round(paths_per_s / REF_PATHS_PER_S, 1),
    }
    extra = {
        "device": str(dev),
        "backend": jax.default_backend(),
        "res": res, "spp": spp, "estimator": estimator,
        "seconds": round(dt, 3),
        "paths_per_s": round(paths_per_s, 1),
        "rays_per_path": round(total_rays / paths, 3),
        "total_rays": total_rays,
    }
    print(json.dumps(result))
    print("# " + json.dumps(extra), file=sys.stderr)


if __name__ == "__main__":
    main()
