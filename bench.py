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
    from monte_carlo_path_tracing_tpu.parallel.mesh import init_distributed_if_needed

    init_distributed_if_needed()  # multi-host no-op unless under a launcher

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
    dot_mode = os.environ.get("BENCH_DOT_MODE") or None
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
        width=res, height=res, spp=spp, estimator=estimator, dot_mode=dot_mode,
        light_sampler="spherical_triangle", max_depth=16, ray_chunk=chunk,
        seed=0,
    )

    n_pix = res * res
    key = rng.base_key(cfg.seed)

    # Path-regeneration renderer (integrator/regen.py): full lane occupancy.
    from monte_carlo_path_tracing_tpu.integrator.regen import render_regen

    lanes = chunk
    n_dev = len(jax.devices())
    total_samples = n_pix * spp

    if n_dev > 1:
        # Pod slice: pixels sharded over all chips, one regen loop each
        # (parallel/sharded.py). Metric stays per-chip.
        from monte_carlo_path_tracing_tpu.parallel import make_mesh
        from monte_carlo_path_tracing_tpu.parallel.sharded import (
            make_regen_sharded,
        )

        mesh = make_mesh((n_dev,), ("tiles",))
        fn = make_regen_sharded(scene, cfg, mesh, lanes)
        # warmup shares the compiled program (sample count is traced)
        jax.block_until_ready(fn(scene, key, jnp.int32(1)))
        t0 = time.perf_counter()
        fb, nrays = fn(scene, key, jnp.int32(spp))
        jax.block_until_ready(fb)
        dt = time.perf_counter() - t0
        total_rays = int(nrays)
    else:
        warm_samples = lanes  # tiny warmup run to trigger compilation

        def run(scene, key, total):
            # `total` stays traced so the warmup and the timed run share
            # one compiled program (it only feeds the while_loop cond).
            return render_regen(scene, cfg, key, n_pix, total, lanes=lanes)

        run_jit = jax.jit(run)
        jax.block_until_ready(run_jit(scene, key, jnp.int32(warm_samples)))

        t0 = time.perf_counter()
        fb, nrays, iters, _ = run_jit(scene, key, jnp.int32(total_samples))
        jax.block_until_ready(fb)
        dt = time.perf_counter() - t0
        total_rays = int(nrays)

    paths = total_samples
    mrays = total_rays / dt / 1e6 / n_dev  # per-chip
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
