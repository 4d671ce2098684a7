"""bench.py end-to-end smoke (subprocess, tiny config, CPU).

The driver records the round's headline by running `python bench.py` on
the real chip; a crash there loses the round's benchmark. This smoke runs
the SAME script at a tiny configuration on CPU and checks the JSON
contract (one parseable line with the metric fields, plus the extra
line's bookkeeping)."""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.parametrize("cache,jitter", [("1", "0"), ("0", "0"), ("1", "1")])
def test_bench_script_contract(cache, jitter):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # keep the TPU plugin out
    env.pop("XLA_FLAGS", None)              # single device: the branch the
    #                                         driver's single-chip run takes
    env.update(
        JAX_PLATFORMS="cpu",
        BENCH_RES="32", BENCH_SPP="2", BENCH_CHUNK="256",
        BENCH_REPS="1", BENCH_REP_SPACING_S="0",
        BENCH_PRIMARY_CACHE=cache,
        BENCH_JITTER=jitter,   # jitter row: cache auto-ineligible
        BENCH_SCENE=os.path.join(_REPO, "scenes", "cornell", "cornell.obj"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    assert d["metric"] == "Mrays/s/chip"
    assert d["value"] > 0
    extra = [l for l in out.stderr.splitlines() if l.startswith("# {")]
    assert extra, out.stderr[-2000:]
    e = json.loads(extra[-1][2:])
    assert e["total_rays"] > 0 and e["fb_checksum"] > 0
    if cache == "1" and jitter == "0":
        assert e["rays_physical"] < e["total_rays"]
    if jitter == "1":
        # jitter forfeits the cache: every logical ray physically traced
        assert e["jitter"] is True
        assert e["rays_physical"] == e["total_rays"]
