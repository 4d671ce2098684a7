#!/usr/bin/env python
"""Author the bundled cg23 scenes into scenes/ (see scene/authoring.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from monte_carlo_path_tracing_tpu.scene import authoring  # noqa: E402


def main() -> None:
    root = os.path.join(os.path.dirname(__file__), "..", "scenes")
    authoring.write_scene(authoring.author_cornell_box(), os.path.join(root, "cornell"))
    authoring.write_scene(authoring.author_veach_mis(), os.path.join(root, "veach-mis"))
    authoring.write_scene(authoring.author_veach_mis_golden(), os.path.join(root, "veach-mis-golden"))
    authoring.write_scene(authoring.author_bathroom(), os.path.join(root, "bathroom"))
    print("scenes written to", os.path.abspath(root))


if __name__ == "__main__":
    main()
