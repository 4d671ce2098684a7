"""Phong BRDF evaluation, sampling, and pdf — batched, branch-free.

Semantics follow the reference BRDF module exactly (BRDF.cpp):

- eval (get_brdf_phong, BRDF.cpp:17-25):
      f_r(wi -> wo) = Kd/pi + Ks * (Ns+1)/(2 pi) * max(wo . R, 0)^Ns,
  R = reflect(wi, N). Both wi (toward light) and wo (toward eye) point away
  from the surface.

- sample (sample_from_phong, BRDF.cpp:28-100): choose the diffuse or
  specular lobe with probabilities proportional to mean(Kd) / mean(Ks)
  (BRDF.cpp:30-43), then warp:
    diffuse:  cosine hemisphere about N, theta = 0.5*acos(1-2*xi1),
              pdf = cos(theta)/pi                      (BRDF.cpp:48-72)
    specular: Phong lobe about R = reflect(wo, N),
              theta = acos(xi1^(1/(Ns+1))),
              pdf = (Ns+1)/(2 pi) * xi1^(Ns/(Ns+1))    (BRDF.cpp:77-100)
  The reference returns P(lobe)*pdf_lobe for the *chosen branch only*
  (quirk Q4); the default here is the true mixture pdf (matching
  eval_sample_from_phong_pdf), with `branch_pdf_compat=True` reproducing
  the reference.

- pdf (eval_sample_from_phong_pdf, BRDF.cpp:107-133): the mixture density
      p(wi) = P_d * max(wi.N,0)/pi + P_s * (Ns+1)/(2 pi) * max(wi.R,0)^Ns.

The sampled direction may land below the surface (the Phong lobe is not
clipped to the hemisphere); the reference terminates such paths
(main.cpp:332-333) — the integrator replicates that via a mask, so no
rejection loop exists here (jit-friendly).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from monte_carlo_path_tracing_tpu.core import rng, vecmath as vm

INV_PI = 1.0 / math.pi
INV_2PI = 1.0 / (2.0 * math.pi)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BsdfSample:
    """sampledRay (BRDF.h:5-16): direction + pdf (+ which lobe, for tests)."""

    wi: jnp.ndarray        # [N,3]
    pdf: jnp.ndarray       # [N]
    is_specular: jnp.ndarray  # [N] bool


def lobe_probs(kd: jnp.ndarray, ks: jnp.ndarray):
    """P(diffuse), P(specular) proportional to mean(Kd), mean(Ks)
    (BRDF.cpp:30-43). Degenerate all-zero materials fall back to diffuse."""
    wd = jnp.mean(kd, axis=-1)
    ws = jnp.mean(ks, axis=-1)
    tot = wd + ws
    pd = jnp.where(tot > 0, wd / jnp.where(tot > 0, tot, 1.0), 1.0)
    return pd, 1.0 - pd


def eval_brdf(
    n: jnp.ndarray, wi: jnp.ndarray, wo: jnp.ndarray,
    kd: jnp.ndarray, ks: jnp.ndarray, ns: jnp.ndarray,
) -> jnp.ndarray:
    """f_r(wi->wo), shape [N,3] (BRDF.cpp:17-25)."""
    r = vm.reflect(wi, n)
    cos_rw = jnp.maximum(vm.dot(wo, r), 0.0)
    spec = (ns + 1.0) * INV_2PI * _powfast(cos_rw, ns)
    return kd * INV_PI + ks * spec[..., None]


def _powfast(x: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """x**n for x>=0 with pow(0, n)=0 — avoids NaN from 0**0 and exp/log of 0."""
    safe = jnp.maximum(x, 1e-30)
    return jnp.where(x > 0.0, jnp.exp(n * jnp.log(safe)), 0.0)


def eval_and_pdf_brdf(
    n: jnp.ndarray, wi: jnp.ndarray, wo: jnp.ndarray,
    kd: jnp.ndarray, ks: jnp.ndarray, ns: jnp.ndarray,
):
    """(f_r(wi->wo), mixture sampling pdf of wi) sharing ONE specular pow.

    Both need (ns+1)/2pi * cos_r^ns with the same cos_r — the Phong lobe
    is reflection-symmetric: wo . reflect(wi, n) == wi . reflect(wo, n)
    (expand reflect: both equal 2(wi.n)(wo.n) - wi.wo). The pow dominates
    the NEE math cost on the VPU, so every NEE evaluation (wavefront +
    regen + pre-pass) uses this fused form."""
    r = vm.reflect(wi, n)
    cos_rw = jnp.maximum(vm.dot(wo, r), 0.0)
    spec = (ns + 1.0) * INV_2PI * _powfast(cos_rw, ns)
    f = kd * INV_PI + ks * spec[..., None]
    pd, ps = lobe_probs(kd, ks)
    p_diff = jnp.maximum(vm.dot(wi, n), 0.0) * INV_PI
    return f, pd * p_diff + ps * spec


def pdf_brdf(
    n: jnp.ndarray, wi: jnp.ndarray, wo: jnp.ndarray,
    kd: jnp.ndarray, ks: jnp.ndarray, ns: jnp.ndarray,
) -> jnp.ndarray:
    """Mixture sampling density of `wi` given view `wo`
    (eval_sample_from_phong_pdf, BRDF.cpp:107-133)."""
    pd, ps = lobe_probs(kd, ks)
    cos_n = vm.dot(wi, n)
    p_diff = jnp.maximum(cos_n, 0.0) * INV_PI
    r = vm.reflect(wo, n)
    cos_r = jnp.maximum(vm.dot(wi, r), 0.0)
    p_spec = (ns + 1.0) * INV_2PI * _powfast(cos_r, ns)
    return pd * p_diff + ps * p_spec


def sample_brdf(
    key: jax.Array,
    n: jnp.ndarray, wo: jnp.ndarray,
    kd: jnp.ndarray, ks: jnp.ndarray, ns: jnp.ndarray,
    branch_pdf_compat: bool = False,
) -> BsdfSample:
    """Draw wi ~ the two-lobe Phong mixture (BRDF.cpp:28-100)."""
    N = n.shape[0]
    xi_lobe = rng.uniform(rng.fold_in(key, 0), (N,))
    xi = rng.uniform(rng.fold_in(key, 1), (N, 2))

    pd, ps = lobe_probs(kd, ks)
    pick_spec = xi_lobe >= pd

    # Diffuse: theta = 0.5*acos(1-2 xi1) => cos(theta) = sqrt((1+ (1-2xi1))/2)?
    # Directly: cos(2*0.5*acos(1-2xi1)) identity aside, the reference's warp
    # (BRDF.cpp:64-66) gives cos_theta = cos(0.5*acos(1-2 xi1)) which equals
    # sqrt(1 - xi1) — the standard cosine-weighted hemisphere inversion.
    cos_t_d = jnp.sqrt(jnp.maximum(1.0 - xi[:, 0], 0.0))
    sin_t_d = jnp.sqrt(jnp.maximum(xi[:, 0], 0.0))

    # Specular: cos(theta) = xi1^(1/(Ns+1)) about R (BRDF.cpp:86-89).
    cos_t_s = _powfast(xi[:, 0], 1.0 / (ns + 1.0))
    sin_t_s = jnp.sqrt(jnp.maximum(1.0 - cos_t_s * cos_t_s, 0.0))

    phi = 2.0 * math.pi * xi[:, 1]
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)

    cos_t = jnp.where(pick_spec, cos_t_s, cos_t_d)
    sin_t = jnp.where(pick_spec, sin_t_s, sin_t_d)
    local = jnp.stack([sin_t * cphi, sin_t * sphi, cos_t], axis=-1)

    r = vm.reflect(wo, n)
    axis = jnp.where(pick_spec[:, None], r, n)
    t, b = vm.orthonormal_basis(axis)
    # Detached-sampling estimator: the sampled direction is a constant of
    # differentiation (gradients flow through f_r/emission/cosines evaluated
    # AT the sample, not through the warp). Also severs the sqrt(1-x^2)
    # backward paths that blow up at lobe edges.
    wi = jax.lax.stop_gradient(vm.from_local(local, t, b, axis))

    if branch_pdf_compat:
        # Reference behaviour (Q4): pdf of the chosen branch only.
        pdf_d = cos_t_d * INV_PI
        pdf_s = (ns + 1.0) * INV_2PI * _powfast(xi[:, 0], ns / (ns + 1.0))
        pdf = jnp.where(pick_spec, ps * pdf_s, pd * pdf_d)
    else:
        pdf = pdf_brdf(n, wi, wo, kd, ks, ns)
    return BsdfSample(wi=wi, pdf=pdf, is_specular=pick_spec)
