"""Differentiable rendering: pixel gradients w.r.t. materials and emission.

The estimators in integrator/wavefront.py are written to be differentiable
end-to-end (BASELINE.json north star): gradients flow through BRDF values
(Kd, Ks, Ns), emitted radiance, cosine/geometry factors and MIS weights,
while discrete events (lobe/triangle choices, RR, visibility) and sampling
pdfs are detached (`stop_gradient`) — the standard detached-sampling
estimator. This module packages loss/grad entry points and the
reparameterisations that keep optimisation in the feasible set.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from monte_carlo_path_tracing_tpu.integrator import render_rays
from monte_carlo_path_tracing_tpu.scene.types import Materials, Scene
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig


def render_loss(
    materials: Materials,
    scene: Scene,
    cfg: RenderConfig,
    key,
    ro,
    rd,
    target,
) -> jnp.ndarray:
    """Mean squared error between rendered radiance and target [N,3]."""
    rad = render_rays(scene.with_materials(materials), cfg, key, ro, rd)
    return jnp.mean((rad - target) ** 2)


def loss_and_grad(materials, scene, cfg, key, ro, rd, target):
    return jax.value_and_grad(render_loss)(
        materials, scene, cfg, key, ro, rd, target
    )


def pixel_grad(scene, cfg, key, ro, rd, select):
    """d(sum(select * image)) / d(materials) — the raw pixel-gradient used
    by the finite-difference verification tests."""

    def f(materials):
        rad = render_rays(scene.with_materials(materials), cfg, key, ro, rd)
        return jnp.sum(rad * select)

    return jax.grad(f)(scene.materials)


# -- Feasible-set reparameterisation ----------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LatentMaterials:
    """Unconstrained latents: kd/ks via sigmoid (in (0,1)), ns/emission via
    LOG (positive, scale-free). Log — not softplus — because Adam moves
    latents by O(lr) per step regardless of gradient magnitude: under a
    ~identity map a shininess of 500 would take thousands of steps to halve,
    while in log space every decade is the same ~2.3 latent units."""

    kd_l: jnp.ndarray
    ks_l: jnp.ndarray
    ns_l: jnp.ndarray
    emission_l: jnp.ndarray


def to_latent(m: Materials) -> LatentMaterials:
    logit = lambda p: jnp.log(p) - jnp.log1p(-p)
    clip = lambda x: jnp.clip(x, 1e-4, 1.0 - 1e-4)
    return LatentMaterials(
        kd_l=logit(clip(m.kd)),
        ks_l=logit(clip(m.ks)),
        ns_l=jnp.log(jnp.maximum(m.ns, 1e-3)),
        emission_l=jnp.log(jnp.maximum(m.emission, 1e-6)),
    )


def from_latent(lm: LatentMaterials) -> Materials:
    return Materials(
        kd=jax.nn.sigmoid(lm.kd_l),
        ks=jax.nn.sigmoid(lm.ks_l),
        ns=jnp.exp(lm.ns_l),
        emission=jnp.exp(lm.emission_l),
    )


def latent_loss(lm, scene, cfg, key, ro, rd, target):
    return render_loss(from_latent(lm), scene, cfg, key, ro, rd, target)


latent_loss_and_grad = jax.value_and_grad(latent_loss)


def make_latent_step(scene: Scene, cfg: RenderConfig, optimizer):
    """One optax step over latent materials; jitted by the caller."""

    @partial(jax.jit, static_argnums=())
    def step(lm, opt_state, key, ro, rd, target):
        loss, g = latent_loss_and_grad(lm, scene, cfg, key, ro, rd, target)
        updates, opt_state = optimizer.update(g, opt_state, lm)
        import optax

        lm = optax.apply_updates(lm, updates)
        return lm, opt_state, loss

    return step
