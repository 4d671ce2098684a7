#!/usr/bin/env python
"""TPU batch 3: VPU vs MXU dot mode for the intersection kernels, then the
regen mini-bench with the winner."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import monte_carlo_path_tracing_tpu.ops.intersect as ops
from monte_carlo_path_tracing_tpu.integrator.regen import render_regen
from monte_carlo_path_tracing_tpu.ops import intersect_pallas as ip
from monte_carlo_path_tracing_tpu.render.camera import generate_rays
from monte_carlo_path_tracing_tpu.scene import load_scene
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig


from monte_carlo_path_tracing_tpu.utils.timing import timed  # noqa: E402


def main():
    print("devices:", jax.devices(), flush=True)
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    scene = load_scene(os.path.join(here, "scenes", "veach-mis", "veach-mis.obj"))
    accel = ops.build_accel(scene)
    N = 1 << 16
    cam = dataclasses.replace(scene.camera, width=256, height=256)
    idx = jnp.arange(N, dtype=jnp.int32) % (256 * 256)
    ro, rd = generate_rays(cam, idx)
    t_max = jnp.full((N,), 10.0)

    results = {}
    for mode in ("mxu", "vpu"):
        ip.DOT_MODE = mode
        ip._call_nearest.clear_cache()
        ip._call_occluded.clear_cache()
        fn = jax.jit(lambda o, d: ops.intersect(accel, o, d, impl="pallas"))
        tn, h = timed(fn, ro, rd, n=10)
        fo = jax.jit(lambda o, d, t: ops.occluded(accel, o, d, t, impl="pallas"))
        to, occ = timed(fo, ro, rd, t_max)
        results[mode] = (tn, to, h, occ)
        print(f"{mode}: nearest {tn*1e3:.2f} ms  occluded {to*1e3:.2f} ms",
              flush=True)

    hm, om = results["mxu"][2], results["mxu"][3]
    hv, ov = results["vpu"][2], results["vpu"][3]
    vv = (np.asarray(hv.valid) == np.asarray(hm.valid)).mean()
    mmask = np.asarray(hv.valid) & np.asarray(hm.valid)
    ii = (np.asarray(hv.tri_id)[mmask] == np.asarray(hm.tri_id)[mmask]).mean()
    tdiff = np.abs(np.asarray(hv.t)[mmask] - np.asarray(hm.t)[mmask]).max()
    oo = (np.asarray(ov) == np.asarray(om)).mean()
    print(f"vpu-vs-mxu: valid={vv:.6f} id={ii:.6f} max|dt|={tdiff:.2e} "
          f"occ={oo:.6f}", flush=True)

    best = "vpu" if results["vpu"][0] < results["mxu"][0] else "mxu"
    ip.DOT_MODE = best
    ip._call_nearest.clear_cache()
    ip._call_occluded.clear_cache()
    print(f"using DOT_MODE={best}", flush=True)

    cfg = RenderConfig(spp=8, estimator="mis", light_sampler="spherical_triangle",
                       max_depth=16)
    n_pix = 512 * 512
    sc2 = dataclasses.replace(
        scene, camera=dataclasses.replace(scene.camera, width=512, height=512)
    )
    run = jax.jit(lambda s, k, tot: render_regen(s, cfg, k, n_pix, tot, lanes=N))
    key = jax.random.key(0)
    np.asarray(run(sc2, key, jnp.int32(N))[0])
    t0 = time.perf_counter()
    fb, nrays, iters, _ = run(sc2, key, jnp.int32(n_pix * 8))
    np.asarray(fb)
    dt = time.perf_counter() - t0
    print(f"regen 512^2x8spp[{best}]: {dt:.2f}s  {float(nrays)/dt/1e6:.2f} "
          f"Mrays/s  {n_pix*8/dt/1e3:.0f} kpaths/s  iters={int(iters)}",
          flush=True)


if __name__ == "__main__":
    main()
