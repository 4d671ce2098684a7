#!/usr/bin/env python
"""TPU: time the pallas intersect kernels per dot mode (vpu / mxu exact /
mxu_fast bf16x3) and report agreement of the fast mode vs exact."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import monte_carlo_path_tracing_tpu.ops.intersect as ops
from monte_carlo_path_tracing_tpu.ops import intersect_pallas as ip
from monte_carlo_path_tracing_tpu.render.camera import generate_rays
from monte_carlo_path_tracing_tpu.scene import load_scene


from monte_carlo_path_tracing_tpu.utils.timing import timed  # noqa: E402


def main():
    print("devices:", jax.devices(), flush=True)
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    scene = load_scene(os.path.join(here, "scenes", "veach-mis", "veach-mis.obj"))
    accel = ops.build_accel(scene)
    N = 1 << 16
    import dataclasses
    cam = dataclasses.replace(scene.camera, width=256, height=256)
    idx = jnp.arange(N, dtype=jnp.int32) % (256 * 256)
    ro, rd = generate_rays(cam, idx)
    t_max = jnp.full((N,), 10.0)
    W, ids = accel.W, accel.tri_ids
    excl = jnp.full((N,), ip.NO_HIT, jnp.int32)

    ref = None
    # NOTE: "mxu_bf16" is a measurement-only mode (RenderConfig rejects it);
    # it bounds the 1-pass-MXU speed ceiling but is too coarse to render with.
    cases = [
        ("vpu", 512, 1792),
        ("mxu_fast", 256, 1792),
        ("mxu_fast", 256, 896),
        ("mxu_fast", 512, 448),
        ("mxu_bf16", 512, 896),
    ]
    save_tiles = (ip.RAY_TILE, ip.TRI_TILE)
    for mode, rt, tt in cases:
        ip.RAY_TILE, ip.TRI_TILE = rt, tt
        ip._call_nearest.clear_cache()
        ip._call_occluded.clear_cache()
        try:
            f_n = jax.jit(lambda o, d: ip.intersect_pallas(o, d, W, ids, excl, mode=mode))
            t_n, h = timed(f_n, ro, rd)
            f_o = jax.jit(
                lambda o, d, t: ip.occluded_pallas(o, d, W, ids, excl, t, mode=mode)
            )
            t_o, occ = timed(f_o, ro, rd, t_max)
        except Exception as e:
            print(f"{mode:9s} ({rt},{tt}) FAILED: {str(e)[:120]}", flush=True)
            continue
        finally:
            ip.RAY_TILE, ip.TRI_TILE = save_tiles
        line = (f"{mode:9s} ({rt:4d},{tt:4d}) nearest {t_n*1e3:6.2f} ms "
                f"({N/t_n/1e6:5.1f} Mray/s)  "
                f"occluded {t_o*1e3:6.2f} ms ({N/t_o/1e6:5.1f} Mray/s)")
        if ref is None:
            ref = (h, occ)
        else:
            h0, occ0 = ref
            sv = (np.asarray(h.valid) == np.asarray(h0.valid)).mean()
            m = np.asarray(h.valid) & np.asarray(h0.valid)
            sid = (np.asarray(h.tri_id)[m] == np.asarray(h0.tri_id)[m]).mean()
            rel = (np.abs(np.asarray(h.t)[m] - np.asarray(h0.t)[m])
                   / np.maximum(np.asarray(h0.t)[m], 1e-3)).max()
            so = (np.asarray(occ) == np.asarray(occ0)).mean()
            line += f"  | vs vpu: valid={sv:.6f} id={sid:.6f} rel_t={rel:.1e} occ={so:.6f}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
