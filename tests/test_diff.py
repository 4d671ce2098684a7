import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monte_carlo_path_tracing_tpu.diff import grad as dgrad
from monte_carlo_path_tracing_tpu.diff.inverse import recover_materials
from monte_carlo_path_tracing_tpu.integrator import render_rays
from monte_carlo_path_tracing_tpu.render.camera import generate_rays
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig


def _small(scene, wh=16):
    cam = dataclasses.replace(scene.camera, width=wh, height=wh)
    return dataclasses.replace(scene, camera=cam)


def _render_sum(scene, cfg, key, ro, rd, materials):
    rad = render_rays(scene.with_materials(materials), cfg, key, ro, rd)
    return float(jnp.sum(rad))


def test_grad_matches_finite_difference_exact_stream(cornell_scene):
    """Per-stream exactness where it must hold: with the BRDF-only
    estimator, emission never enters any sampling distribution, so the
    analytic gradient equals finite differences on a FIXED threefry stream
    (the MC noise cancels exactly)."""
    scene = _small(cornell_scene)
    cfg = RenderConfig(spp=1, estimator="brdf", max_depth=3, seed=0)
    idx = jnp.arange(256, dtype=jnp.int32)
    ro, rd = generate_rays(scene.camera, idx)
    key = jax.random.key(11)
    g = dgrad.pixel_grad(scene, cfg, key, ro, rd, jnp.ones((256, 3)))

    mats = scene.materials
    eps = 0.5
    for coord in [(7, 0), (7, 2)]:
        up = _render_sum(
            scene, cfg, key, ro, rd,
            dataclasses.replace(mats, emission=mats.emission.at[coord].add(eps)),
        )
        dn = _render_sum(
            scene, cfg, key, ro, rd,
            dataclasses.replace(mats, emission=mats.emission.at[coord].add(-eps)),
        )
        fd = (up - dn) / (2 * eps)
        an = float(g.emission[coord])
        assert abs(fd - an) <= 1e-3 * max(1.0, abs(fd)), (coord, fd, an)


@pytest.mark.parametrize("estimator", ["brdf", "split", "mis"])
def test_grad_matches_finite_difference_expectation(cornell_scene, estimator):
    """Detached-sampling gradients are unbiased: E[analytic] = E[FD] = the
    true gradient, even for params (kd/ks/ns) that also steer the sampling
    pdfs. Average both over K independent streams and compare."""
    scene = _small(cornell_scene)
    cfg = RenderConfig(
        spp=1, estimator=estimator, light_sampler="spherical_triangle",
        max_depth=3, seed=0,
    )
    idx = jnp.arange(256, dtype=jnp.int32)
    ro, rd = generate_rays(scene.camera, idx)
    K = 16
    keys = jnp.stack([jax.random.key(100 + i) for i in range(K)])
    mats = scene.materials

    @jax.jit
    def rsum(materials, key):
        rad = render_rays(scene.with_materials(materials), cfg, key, ro, rd)
        return jnp.sum(rad)

    grad_fn = jax.jit(jax.grad(rsum))
    grads = [grad_fn(mats, keys[i]) for i in range(K)]

    checks = [("kd", (0, 0), 1e-2), ("ks", (6, 2), 1e-2), ("ns", (6,), 2.0)]
    for field, coord, eps in checks:
        base = getattr(mats, field)
        m_up = dataclasses.replace(mats, **{field: base.at[coord].add(eps)})
        m_dn = dataclasses.replace(mats, **{field: base.at[coord].add(-eps)})
        fds = [
            (float(rsum(m_up, keys[i])) - float(rsum(m_dn, keys[i]))) / (2 * eps)
            for i in range(K)
        ]
        fd = float(np.mean(fds))
        an = float(np.mean([float(getattr(g, field)[coord]) for g in grads]))
        fd_sem = float(np.std(fds) / np.sqrt(K))
        tol = 0.12 * max(abs(fd), abs(an)) + 4.0 * fd_sem + 2e-2
        assert abs(fd - an) <= tol, (estimator, field, coord, fd, an, fd_sem)


def test_latent_roundtrip(cornell_scene):
    m = cornell_scene.materials
    m2 = dgrad.from_latent(dgrad.to_latent(m))
    np.testing.assert_allclose(np.asarray(m2.kd), np.clip(np.asarray(m.kd), 1e-4, 1 - 1e-4), atol=2e-4)
    np.testing.assert_allclose(np.asarray(m2.ns), np.asarray(m.ns), rtol=1e-4)


def test_inverse_rendering_recovers_kd(cornell_scene):
    """configs[3] miniature: perturb the red wall's Kd, recover by descent."""
    scene = _small(cornell_scene)
    cfg = RenderConfig(
        spp=1, estimator="mis", light_sampler="spherical_triangle",
        max_depth=3, seed=0,
    )
    true_kd = np.asarray(scene.materials.kd)
    init = dataclasses.replace(
        scene.materials,
        kd=jnp.clip(scene.materials.kd + jnp.asarray([[0.25, -0.2, 0.15]]), 0.02, 0.95),
    )
    res = recover_materials(
        scene, init, cfg, steps=100, lr=0.1, rays_per_step=256, seed=2,
        optimize=("kd",),
    )
    # The light material's Kd is unrecoverable by design (lights are pure
    # emitters, Q5 — their BRDF never touches the image); score the rest.
    vis = ~np.isin(
        np.arange(true_kd.shape[0]),
        np.unique(np.asarray(scene.tri_mat_id)[np.asarray(scene.is_light)]),
    )
    err0 = np.abs(
        np.asarray(dgrad.from_latent(dgrad.to_latent(init)).kd) - true_kd
    )[vis].mean()
    err1 = np.abs(np.asarray(res.materials.kd) - true_kd)[vis].mean()
    assert err1 < 0.4 * err0, (err0, err1)


def test_inverse_checkpoint_resume(cornell_scene, tmp_path):
    """Stopping at step k and resuming from the checkpoint reproduces the
    uninterrupted run exactly (counter-keyed streams)."""
    scene = _small(cornell_scene, wh=8)
    cfg = RenderConfig(spp=1, estimator="brdf", max_depth=2, seed=0)
    init = dataclasses.replace(
        scene.materials, kd=jnp.clip(scene.materials.kd + 0.2, 0.02, 0.95)
    )
    ck = str(tmp_path / "inv.npz")

    full = recover_materials(scene, init, cfg, steps=6, lr=0.1,
                             rays_per_step=64, seed=3)
    # run 1: stops after 3 steps (checkpointing every step)
    recover_materials(scene, init, cfg, steps=3, lr=0.1, rays_per_step=64,
                      seed=3, checkpoint_path=ck, checkpoint_every=1)
    # run 2: resumes to 6
    resumed = recover_materials(scene, init, cfg, steps=6, lr=0.1,
                                rays_per_step=64, seed=3,
                                checkpoint_path=ck, checkpoint_every=1)
    np.testing.assert_allclose(
        np.asarray(resumed.materials.kd), np.asarray(full.materials.kd),
        rtol=1e-5, atol=1e-6,
    )
    assert len(resumed.losses) == 6


@pytest.mark.slow
def test_inverse_rendering_joint_four_families(cornell_scene, veach_scene):
    """configs[3]: jointly optimize kd + ks + ns + emission (nothing
    frozen) and require each family to recover where the scene carries its
    signal — kd/ks/emission on cornell (diffuse box + one glossy block),
    ks/ns/emission on veach-mis (the shininess scene: four plates with
    ns 60..10000, four emitters spanning 50..3556 radiance). docs/
    inverse_joint_recovery.json records a longer 600-step run of the same
    setup."""

    def joint(scene, wh, steps, rays, lr, clip, seed):
        scene = dataclasses.replace(
            scene, camera=dataclasses.replace(
                scene.camera, width=wh[0], height=wh[1])
        )
        cfg = RenderConfig(spp=1, estimator="mis", max_depth=3, seed=0)
        m = scene.materials
        init = dataclasses.replace(
            m,
            kd=jnp.clip(m.kd + 0.15 * (m.kd.sum(-1, keepdims=True) > 0), 0.02, 0.95),
            ks=jnp.clip(m.ks - 0.3 * (m.ks > 0), 0.0, 0.95),
            ns=m.ns * 0.4,
            emission=m.emission * 0.5,
        )
        res = recover_materials(
            scene, init, cfg, steps=steps, lr=lr, rays_per_step=rays,
            seed=seed, loss_clip=clip,
        )
        r = res.materials
        spec = np.asarray(m.ks).sum(1) > 0
        lit = np.asarray(m.emission).sum(1) > 0
        vis = (np.asarray(m.kd).sum(1) > 0) & ~lit
        mae = lambda a, b, k: float(np.abs(np.asarray(a) - np.asarray(b))[k].mean())
        return {
            "kd": (mae(init.kd, m.kd, vis), mae(r.kd, m.kd, vis)),
            "ks": (mae(init.ks, m.ks, spec), mae(r.ks, m.ks, spec)),
            "ns_log": (
                float(np.abs(np.log(np.asarray(init.ns) / np.asarray(m.ns)))[spec].mean()),
                float(np.abs(np.log(np.asarray(r.ns) / np.asarray(m.ns)))[spec].mean()),
            ),
            "em_rel": (0.5, float((np.abs(
                np.asarray(r.emission).sum(1) - np.asarray(m.emission).sum(1)
            )[lit] / np.asarray(m.emission).sum(1)[lit]).mean())),
        }

    c = joint(cornell_scene, (32, 32), 250, 512, 0.08, None, 2)
    # kd gate sized from a 3-seed sweep at this budget (ratios 0.07-0.15;
    # the 1500-step x 4096-ray artifact run reaches 0.017 absolute =
    # ratio 0.11, docs/inverse_joint_recovery.json).
    assert c["kd"][1] < 0.25 * c["kd"][0], c["kd"]
    assert c["ks"][1] < 0.6 * c["ks"][0], c["ks"]
    assert c["em_rel"][1] < 0.25 * c["em_rel"][0], c["em_rel"]

    # Gates sized from a two-seed sweep at this budget (worst ratios
    # 0.37 / 0.39 / 0.32); the 1500-step x 4096-ray artifact run reaches
    # 0.22 / 0.13 / 0.078 (docs/inverse_joint_recovery.json).
    v = joint(veach_scene, (48, 27), 300, 648, 0.06, 5.0, 2)
    assert v["ks"][1] < 0.43 * v["ks"][0], v["ks"]
    assert v["ns_log"][1] < 0.45 * v["ns_log"][0], v["ns_log"]
    assert v["em_rel"][1] < 0.34 * v["em_rel"][0], v["em_rel"]


def test_twoscene_artifact_gates():
    """The committed one-run all-four-family artifact
    (scripts/tpu_inverse_twoscene.py, VERDICT r4 item 8) must keep its
    gates: kd (cornell) <= 0.06 AND ns_log (veach) <= 0.2 from a SINGLE
    optimization, plus every family improved vs its init error."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "inverse_twoscene.json")
    with open(path) as f:
        d = json.load(f)
    g = d["gates"]
    assert g["pass_kd_0.06_and_nslog_0.2"] is True
    assert g["kd_cornell"] <= 0.06
    assert g["ns_log_veach"] <= 0.2
    for scene in ("cornell", "veach-mis"):
        for fam in ("kd", "ks", "ns_log"):
            init, final = d["scenes"][scene][fam]
            assert final < init, (scene, fam, init, final)
