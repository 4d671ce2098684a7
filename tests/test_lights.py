import math

import jax
import jax.numpy as jnp
import numpy as np

from monte_carlo_path_tracing_tpu.core import vecmath as vm
from monte_carlo_path_tracing_tpu.sampling import light_spherical, light_uniform


def test_uniform_select_table_sums_to_one(cornell_scene, veach_scene):
    for sc in (cornell_scene, veach_scene):
        p = np.asarray(light_uniform.select_table(sc))
        assert p.shape == (sc.num_lights,)
        np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-5)
        assert np.all(p >= 0)


def test_uniform_sample_on_triangle(cornell_scene):
    key = jax.random.key(0)
    ls = light_uniform.sample(key, cornell_scene, 4096)
    # every sampled point lies on its triangle's plane and inside it
    tri = np.asarray(ls.tri_id)
    v0 = np.asarray(cornell_scene.tri_v0)[tri]
    e1 = np.asarray(cornell_scene.tri_e1)[tri]
    e2 = np.asarray(cornell_scene.tri_e2)[tri]
    n = np.cross(e1, e2)
    d = np.sum((np.asarray(ls.coord) - v0) * n, axis=-1)
    np.testing.assert_allclose(d, 0.0, atol=1e-5)
    # pdf is the area density p_sel / area
    p_sel = np.asarray(light_uniform.select_table(cornell_scene))
    area = np.asarray(cornell_scene.light_area)
    lidx = np.asarray(ls.light_idx)
    np.testing.assert_allclose(
        np.asarray(ls.pdf), p_sel[lidx] / area[lidx], rtol=1e-5
    )


def test_uniform_class_frequencies(veach_scene):
    """Empirical class pick frequency matches radiance-sum weighting."""
    key = jax.random.key(1)
    ls = light_uniform.sample(key, veach_scene, 200_000)
    cls = np.asarray(veach_scene.light_class)[np.asarray(ls.light_idx)]
    freq = np.bincount(cls, minlength=4) / 200_000
    p_sel = np.asarray(light_uniform.select_table(veach_scene))
    expect = np.asarray(
        [p_sel[np.asarray(veach_scene.light_class) == k].sum() for k in range(4)]
    )
    np.testing.assert_allclose(freq, expect, atol=0.01)


def _octant_triangle():
    """Spherical triangle = positive octant (verts on axes), area pi/2."""
    x1 = jnp.zeros((1, 3))
    pa = jnp.asarray([[2.0, 0.0, 0.0]])
    pb = jnp.asarray([[0.0, 2.0, 0.0]])
    pc = jnp.asarray([[0.0, 0.0, 2.0]])
    # light plane normal pointing back at origin
    nl = vm.normalize(jnp.asarray([[-1.0, -1.0, -1.0]]))
    n = vm.normalize(jnp.asarray([[1.0, 1.0, 1.0]]))  # shading normal
    return x1, n, pa, pb, pc, nl


def test_project_octant_area():
    x1, n, pa, pb, pc, nl = _octant_triangle()
    pr = light_spherical.project(x1, n, pa, pb, pc, nl)
    assert bool(pr["valid"][0])
    # spherical excess of the octant = pi/2; all angles pi/2
    np.testing.assert_allclose(float(pr["sA"][0]), math.pi / 2, rtol=1e-4)
    np.testing.assert_allclose(float(pr["alpha"][0]), math.pi / 2, rtol=1e-4)
    np.testing.assert_allclose(float(pr["edge_c"][0]), math.pi / 2, rtol=1e-4)


def test_project_culls():
    x1, n, pa, pb, pc, nl = _octant_triangle()
    # behind the light plane: flip the light normal
    pr = light_spherical.project(x1, n, pa, pb, pc, -nl)
    assert not bool(pr["valid"][0])
    # light below the horizon: flip the shading normal
    pr = light_spherical.project(x1, -n, pa, pb, pc, nl)
    assert not bool(pr["valid"][0])


def test_arvo_samples_uniform_in_octant():
    """Directions sampled in the octant triangle are (a) inside it and
    (b) uniform: each sub-octant-by-sign region unused, instead check the
    mean direction ~ centroid and z-coordinate distribution vs analytic."""
    x1, n, pa, pb, pc, nl = _octant_triangle()
    M = 50_000
    pr = light_spherical.project(
        jnp.tile(x1, (M, 1)), jnp.tile(n, (M, 1)),
        jnp.tile(pa, (M, 1)), jnp.tile(pb, (M, 1)), jnp.tile(pc, (M, 1)),
        jnp.tile(nl, (M, 1)),
    )
    P = light_spherical._arvo_warp(
        jax.random.key(2), pr["A"], pr["B"], pr["C"], pr["alpha"],
        jnp.cos(pr["edge_c"]), pr["sA"],
    )
    P = np.asarray(P)
    assert np.all(P > -1e-5)  # inside the positive octant
    np.testing.assert_allclose(np.linalg.norm(P, axis=-1), 1.0, atol=1e-5)
    # Uniform on the octant: each coordinate has mean 1/2... by symmetry the
    # three coordinate means are equal and E[z] = integral z dw / (pi/2) = 1/2.
    np.testing.assert_allclose(P.mean(axis=0), 0.5, atol=0.01)


def test_sample_and_pdf_consistency(cornell_scene):
    key = jax.random.key(3)
    N = 1024
    # shading points on the floor looking up
    x1 = jnp.concatenate(
        [
            jax.random.uniform(key, (N, 1), minval=-0.9, maxval=0.9),
            jnp.full((N, 1), 0.01),
            jax.random.uniform(jax.random.key(7), (N, 1), minval=-0.9, maxval=0.9),
        ],
        axis=1,
    )
    n = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (N, 1))
    ls, wsum = light_spherical.sample(key, cornell_scene, x1, n)
    assert bool(jnp.all(ls.valid))
    # sampled points land on the ceiling light plane (y ~ 1.999)
    np.testing.assert_allclose(np.asarray(ls.coord)[:, 1], 1.999, atol=1e-3)
    # pdf_of_tri of the chosen tri reproduces ls.pdf
    pdf2 = light_spherical.pdf_of_tri(cornell_scene, x1, n, ls.light_idx, wsum)
    np.testing.assert_allclose(np.asarray(pdf2), np.asarray(ls.pdf), rtol=1e-4)


def test_spherical_pdf_integrates_to_one(cornell_scene):
    """Sum over light tris of sA_l * pdf_l = 1 at any receiver: the sampler
    is a proper density over the union of projected triangles."""
    x1 = jnp.asarray([[0.3, 0.2, -0.1]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    w, wsum = light_spherical.prepare(cornell_scene, x1, n)
    # pdf_l = Lsum_l / wsum; weight_l = sA_l * Lsum_l  =>  sum sA_l*pdf_l
    # = sum weight_l / wsum = 1
    np.testing.assert_allclose(
        np.asarray(jnp.sum(w, axis=-1) / wsum), [1.0], rtol=1e-5
    )


def test_no_light_fallback(cornell_scene):
    """Receiver facing away from all lights gets the dummy sample."""
    x1 = jnp.asarray([[0.0, 0.5, 0.0]])
    n = jnp.asarray([[0.0, -1.0, 0.0]])  # looking at the floor
    ls, wsum = light_spherical.sample(jax.random.key(4), cornell_scene, x1, n)
    assert not bool(ls.valid[0])
    assert float(ls.pdf[0]) == 1.0
    np.testing.assert_allclose(np.asarray(ls.emission), 0.0)


def test_fast_solid_angle_matches_girard(rng_np):
    """Van Oosterom-Strackee sA == Girard-excess sA on random valid configs."""
    from monte_carlo_path_tracing_tpu.sampling.light_spherical import (
        project, solid_angle_fast,
    )

    N = 512
    x1 = jnp.asarray(rng_np.uniform(-1, 1, (N, 3)), jnp.float32)
    n = vm.normalize(jnp.asarray(rng_np.normal(size=(N, 3)), jnp.float32))
    pa = x1 + jnp.asarray(rng_np.uniform(1, 3, (N, 3)), jnp.float32)
    pb = pa + jnp.asarray(rng_np.normal(size=(N, 3)), jnp.float32)
    pc = pa + jnp.asarray(rng_np.normal(size=(N, 3)), jnp.float32)
    nl = vm.normalize(jnp.cross(pb - pa, pc - pa))
    # orient light normals toward x1 so the front cull passes sometimes
    flip = vm.dot(nl, x1 - pa) < 0
    nl = jnp.where(flip[:, None], -nl, nl)

    pr = project(x1, n, pa, pb, pc, nl)
    sA, valid = solid_angle_fast(x1, n, pa, pb, pc, nl)
    both = np.asarray(pr["valid"] & valid)
    assert both.sum() > 50
    np.testing.assert_allclose(
        np.asarray(sA)[both], np.asarray(pr["sA"])[both], rtol=2e-3, atol=1e-4
    )


def test_prepare_bilinear_matches_direct(cornell_scene, veach_scene, rng_np):
    """The quadratic-form-expanded prepare() equals the direct per-pair
    VOS computation (solid_angle_fast) on both bundled scenes."""
    from monte_carlo_path_tracing_tpu.core.radiometry import radiance_sum

    for sc in (cornell_scene, veach_scene):
        N = 128
        x1 = jnp.asarray(rng_np.uniform(-3, 3, (N, 3)), jnp.float32)
        n = vm.normalize(jnp.asarray(rng_np.normal(size=(N, 3)), jnp.float32))
        w, wsum = light_spherical.prepare(sc, x1, n)

        pa, pb, pc = sc.light_verts()
        nl = sc.geo_n[sc.light_tri_ids]
        sA, valid = light_spherical.solid_angle_fast(
            x1[:, None], n[:, None], pa[None], pb[None], pc[None], nl[None]
        )
        l_sum = radiance_sum(sc.light_emission())
        w_ref = np.where(np.asarray(valid), np.asarray(sA) * np.asarray(l_sum)[None], 0.0)
        # tolerate eps-borderline cull disagreements on a few pairs
        diff = np.abs(np.asarray(w) - w_ref)
        scale = np.maximum(w_ref.max(), 1e-6)
        bad = (diff > 2e-3 * scale).mean()
        assert bad < 2e-3, bad
        np.testing.assert_allclose(
            np.asarray(wsum), w_ref.sum(-1), rtol=5e-3, atol=1e-4
        )


def test_project_for_warp_matches_full_projection():
    """The lean warp projection (1 acos + 1 atan2) agrees with the full
    Girard-chain `project` on everything Arvo's warp consumes."""
    rng = np.random.default_rng(11)
    M = 256
    x1 = jnp.asarray(rng.normal(size=(M, 3)), jnp.float32)
    n = jnp.asarray(rng.normal(size=(M, 3)), jnp.float32)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    pa = x1 + jnp.asarray(rng.normal(size=(M, 3)) + 3.0, jnp.float32)
    pb = x1 + jnp.asarray(rng.normal(size=(M, 3)) + 3.0, jnp.float32)
    pc = x1 + jnp.asarray(rng.normal(size=(M, 3)) + 3.0, jnp.float32)
    nl = jnp.cross(pb - pa, pc - pa)
    nl = nl / jnp.linalg.norm(nl, axis=-1, keepdims=True)

    pr = light_spherical.project(x1, n, pa, pb, pc, nl)
    A, B, C, alpha, cos_c, sA = light_spherical._project_for_warp(
        x1, n, pa, pb, pc
    )
    v = np.asarray(pr["valid"])
    assert v.sum() > 20  # enough non-degenerate cases to be meaningful
    np.testing.assert_allclose(np.asarray(A)[v], np.asarray(pr["A"])[v], atol=1e-5)
    np.testing.assert_allclose(np.asarray(B)[v], np.asarray(pr["B"])[v], atol=1e-5)
    np.testing.assert_allclose(np.asarray(C)[v], np.asarray(pr["C"])[v], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(alpha)[v], np.asarray(pr["alpha"])[v], atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(cos_c)[v], np.cos(np.asarray(pr["edge_c"]))[v], atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(sA)[v], np.asarray(pr["sA"])[v], atol=2e-3)
