#!/usr/bin/env python
"""Quantify the estimator-compat deltas against the scalar oracle.

Runs the pure-NumPy f64 recursive oracle (oracle/scalar.py) in decomposed
flag modes on probe patches of both bundled scenes and reports, with
K-chunk MC error bars, the relative effect of:

  - Q11 (VERDICT missing #1/#2): the repo's NEE restructure vs the
    reference's full light-strategy recursion, including the
    occluded-blocker branch (/root/reference/main.cpp:455-464). Isolated at
    mixture-pdf weighting (branch_pdf=False) because the Q4 branch-pdf
    estimator is heavy-tailed and would drown the effect in MC noise.
  - Q4: dividing by the branch pdf instead of the mixture pdf.
  - the reference's nearest-light MIS denominators vs the restructured
    balance-heuristic weights.

Writes docs/parity_oracle.json; headline numbers go into docs/PARITY.md.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

CHUNKS = 6

MODES = {
    # name: (blocker_recursion, ref_mis_weights, branch_pdf)
    "blocker_mixture": (True, True, False),    # reference recursion, Q4 fixed
    "noblocker_mixture": (False, True, False),  # -> Q11 effect, low-noise
    "reference_exact": (True, True, True),      # the reference verbatim
    "noblocker_branchpdf": (False, True, True),
    "repo_default": (False, False, False),
}


def patch(scene_path, wh, pixels, spp, seed_base=0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from monte_carlo_path_tracing_tpu.oracle import ScalarOracle
    from monte_carlo_path_tracing_tpu.render.camera import generate_rays
    from monte_carlo_path_tracing_tpu.scene import load_scene

    sc = load_scene(scene_path)
    cam = dataclasses.replace(sc.camera, width=wh[0], height=wh[1])
    sc = dataclasses.replace(sc, camera=cam)
    ro, rd = generate_rays(cam, jnp.asarray(pixels, jnp.int32))
    ro, rd = np.asarray(ro), np.asarray(rd)

    out = {}
    for mi, (name, (blk, ref, bp)) in enumerate(MODES.items()):
        o = ScalarOracle(
            sc, estimator="mis", blocker_recursion=blk,
            ref_mis_weights=ref, branch_pdf=bp,
        )
        t0 = time.time()
        rng = np.random.default_rng(seed_base + 101 * mi)
        chunk_means = np.array(
            [o.trace(rng, ro, rd, spp // CHUNKS).mean() for _ in range(CHUNKS)]
        )
        mean = float(chunk_means.mean())
        sigma = float(chunk_means.std(ddof=1) / np.sqrt(CHUNKS))
        out[name] = {
            "patch_mean": mean,
            "sigma": sigma,
            "seconds": round(time.time() - t0, 1),
        }
        print(f"{name:20s} mean={mean:.5f} ±{sigma:.5f} "
              f"({out[name]['seconds']}s)", flush=True)
    return out


def effects(r):
    def rel(a, b):
        m = (r[a]["patch_mean"], r[b]["patch_mean"])
        s = (r[a]["sigma"], r[b]["sigma"])
        d = (m[1] - m[0]) / m[0]
        sd = float(np.hypot(*s)) / m[0]
        return {"rel": d, "sigma_rel": sd}

    return {
        # Q11 bundle: the repo's NEE restructure vs the reference's full
        # light-strategy recursion (at equal weighting). NOT purely the
        # dropped blocker term: the restructure also accepts emission by
        # nearest==sampled + geometric cos_l>0 where the reference's child
        # uses the INTERPOLATED normal — on tessellated sphere lights the
        # silhouette rim flips between the two, and measurement shows that
        # acceptance difference dominates (the restructure measures
        # BRIGHTER despite dropping a non-negative term).
        "q11_nee_restructure": rel("blocker_mixture", "noblocker_mixture"),
        # Q4: branch pdf vs mixture pdf under the reference's weights
        "q4_branch_pdf": rel("noblocker_mixture", "noblocker_branchpdf"),
        # full reference vs the repo's default estimator
        "reference_vs_repo_default": rel("reference_exact", "repo_default"),
    }


def main():
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    spp = int(os.environ.get("PARITY_SPP", "3000"))
    spp_veach = int(os.environ.get("PARITY_SPP_VEACH", str(spp)))
    results = {}
    print("== cornell ==", flush=True)
    results["cornell"] = patch(
        os.path.join(here, "scenes", "cornell", "cornell.obj"),
        (16, 16), [17, 60, 100, 120, 137, 200, 230, 150], spp,
    )
    print("== veach-mis ==", flush=True)
    results["veach"] = patch(
        os.path.join(here, "scenes", "veach-mis", "veach-mis.obj"),
        (32, 18), [100, 200, 260, 300, 350, 400, 450, 500], spp_veach,
    )

    for scname, r in results.items():
        r["effects"] = effects(r)
        for k, e in r["effects"].items():
            print(f"{scname}: {k} = {e['rel']*100:+.2f}% "
                  f"(MC ±{e['sigma_rel']*100:.2f}%)")

    out = os.path.join(here, "docs", "parity_oracle.json")
    with open(out, "w") as f:
        json.dump(
            {"spp": spp, "spp_veach": spp_veach, "chunks": CHUNKS,
             "results": results}, f, indent=1,
        )
    print("wrote", out)


if __name__ == "__main__":
    main()
