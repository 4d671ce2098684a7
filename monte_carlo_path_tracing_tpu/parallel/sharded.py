"""Sharded rendering and the distributed differentiable train step.

Two composition styles, both idiomatic jax.sharding:

- :func:`render_rays_sharded` — automatic partitioning: rays carry a
  NamedSharding over the ``tiles`` axis, the scene is replicated, and XLA
  propagates the sharding through the (purely per-ray) wavefront loop. No
  collectives are needed in the forward pass because rays never communicate.

- :func:`make_train_step` — explicit shard_map for the inverse-rendering
  step: rays sharded over ``tiles``, sample streams over ``spp``; the
  per-shard material gradient is all-reduced with ``psum`` over BOTH axes
  (the ICI ride), so every device leaves the step with identical updated
  materials. This is the renderer's analogue of data-parallel training with
  replicated parameters.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from monte_carlo_path_tracing_tpu.integrator import render_rays
from monte_carlo_path_tracing_tpu.parallel.mesh import (
    AXIS_SPP, AXIS_TILES, Mesh, ray_sharding, replicated,
)
from monte_carlo_path_tracing_tpu.scene.types import Materials, Scene
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig


def render_rays_sharded(
    scene: Scene, cfg: RenderConfig, key, ro, rd, mesh: Mesh
) -> jnp.ndarray:
    """Radiance [N,3] with rays sharded over the mesh's `tiles` axis."""
    rs = ray_sharding(mesh)
    rep = replicated(mesh)
    ro = jax.device_put(ro, rs)
    rd = jax.device_put(rd, rs)
    scene = jax.device_put(scene, rep)

    fn = jax.jit(
        partial(render_rays, cfg=cfg),
        static_argnames=(),
        out_shardings=rs,
    )
    return fn(scene, key=key, ro=ro, rd=rd)


def make_regen_sharded(
    scene_like: Scene,
    cfg: RenderConfig,
    mesh: Mesh,
    lanes_per_device: int = 1 << 16,
    spp_cap: int | None = None,
    with_physical: bool = False,
):
    """Build a jitted sharded path-regeneration renderer.

    Pixels are sharded over the mesh's `tiles` axis: each device runs an
    independent regeneration loop over its contiguous pixel range (no
    communication — rays never talk; the sharded framebuffer is the output
    layout). The returned function is
        fn(scene, key, samples_per_pixel: jnp.int32)
          -> (framebuffer_sum [n_pix, 3], rays_traced)
    with the sample count TRACED so a cheap warmup call shares the
    compiled program with the timed/real run.

    ``spp_cap`` (static upper bound on the traced spp) opts the shards
    into the primary-hit cache renderer when the config is eligible: each
    shard runs its own pre-pass over its interleaved pixel subset (the
    pre-pass takes the shard's (offset, stride) so per-pixel streams stay
    global) and a seed-mode loop. None keeps the plain regen loop.

    ``with_physical=True`` returns a third output: the psum'd PHYSICALLY
    traced ray count (== logical unless the cache served primaries).
    """
    from monte_carlo_path_tracing_tpu.integrator.regen import (
        primary_cache_eligible, render_regen, render_regen_cached,
    )

    cam = scene_like.camera
    n_pix = cam.height * cam.width
    nd = mesh.shape[AXIS_TILES]
    if n_pix % nd:
        raise ValueError(f"pixel count {n_pix} not divisible by {nd} devices")
    local = n_pix // nd
    use_cache = spp_cap is not None and (
        cfg.primary_cache if cfg.primary_cache is not None
        else primary_cache_eligible(cfg)
    )
    if use_cache and cfg.spp > spp_cap:
        # primary_prepass clamps traced rounds to the static cap; a launch
        # whose intended spp exceeds it would silently under-sample.
        raise ValueError(
            f"cfg.spp={cfg.spp} exceeds spp_cap={spp_cap}: the primary-cache "
            "pre-pass sizes its seed buffers by spp_cap and clamps the "
            "traced round count to it"
        )

    def shard_fn(sc, key, spp):
        d = jax.lax.axis_index(AXIS_TILES)
        # Interleaved assignment (device d owns pixels d, d+nd, ...):
        # neighbouring pixels cost similar work, so this balances the
        # RR-driven load variance across devices (SURVEY.md §7 #4).
        # Streams are keyed by GLOBAL (spp round, pixel id) inside
        # render_regen — no per-device key fold — so the image is invariant
        # to the device count (tests/test_parallel.py pins 1- vs N-device).
        if use_cache:
            fb, nrays, _, stats = render_regen_cached(
                sc, cfg, key, local, spp_cap, spp,
                lanes=lanes_per_device, pixel_offset=d, pixel_stride=nd,
            )
            nphys = stats.rays_physical
        else:
            fb, nrays, _, _ = render_regen(
                sc, cfg, key, local, local * spp,
                lanes=lanes_per_device, pixel_offset=d, pixel_stride=nd,
            )
            nphys = nrays
        out = (fb, jax.lax.psum(nrays, AXIS_TILES))
        if with_physical:
            out = out + (jax.lax.psum(nphys, AXIS_TILES),)
        return out

    out_specs = (P(AXIS_TILES), P()) + ((P(),) if with_physical else ())
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(fn)


def deinterleave_framebuffer(fb, n_devices: int):
    """Undo the interleaved pixel assignment of :func:`make_regen_sharded`
    on the host: concatenated shard output row d*local+i holds global pixel
    i*n_devices+d."""
    import numpy as np

    fb = np.asarray(fb)
    n_pix = fb.shape[0]
    local = n_pix // n_devices
    return fb.reshape(n_devices, local, 3).transpose(1, 0, 2).reshape(n_pix, 3)


def render_regen_sharded(
    scene: Scene,
    cfg: RenderConfig,
    key,
    mesh: Mesh,
    lanes_per_device: int = 1 << 16,
    spp_cap: int | None = None,
):
    """One-shot convenience wrapper over :func:`make_regen_sharded`.
    Returns (framebuffer_sum [n_pix,3] in GLOBAL pixel order (host array),
    rays_traced)."""
    fn = make_regen_sharded(scene, cfg, mesh, lanes_per_device, spp_cap)
    fb, nrays = fn(scene, key, jnp.int32(cfg.spp))
    nd = mesh.shape[AXIS_TILES]
    return deinterleave_framebuffer(fb, nd), nrays


def make_train_step(scene: Scene, cfg: RenderConfig, mesh: Mesh, lr: float = 2e-2):
    """Build a jitted distributed inverse-rendering step.

    step(materials, key, ro, rd, target) -> (new_materials, loss)

    ro/rd/target are globally laid out [N, 3] and sharded over ``tiles``;
    each ``spp`` mesh slice renders an independent sample stream of the same
    rays (key folded by spp-coordinate) and radiance is pmean'd over
    ``spp``. The L2 loss against ``target`` is psum'd over ``tiles`` and
    material grads over both axes.
    """
    has_spp = AXIS_SPP in mesh.axis_names
    axes = (AXIS_TILES, AXIS_SPP) if has_spp else (AXIS_TILES,)

    def shard_loss(materials: Materials, key, ro, rd, target):
        sc = scene.with_materials(materials)
        if has_spp:
            key = jax.random.fold_in(key, jax.lax.axis_index(AXIS_SPP))
        rad = render_rays(sc, cfg, key, ro, rd)
        if has_spp:
            rad = jax.lax.pmean(rad, AXIS_SPP)
        # mean L2 over the *global* ray set: local sum, psum, global count.
        local = jnp.sum((rad - target) ** 2)
        n_local = jnp.asarray(ro.shape[0], jnp.float32)
        total = jax.lax.psum(local, AXIS_TILES)
        count = jax.lax.psum(n_local, AXIS_TILES) * 3.0
        return total / count

    def shard_step(materials, key, ro, rd, target):
        loss, grads = jax.value_and_grad(shard_loss)(materials, key, ro, rd, target)
        # all-reduce grads over every mesh axis -> replicated update
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, axes), grads)
        new = jax.tree.map(lambda p, g: p - lr * g, materials, grads)
        return new, loss

    in_specs = (
        P(),                # materials replicated
        P(),                # key replicated
        P(AXIS_TILES),      # ro
        P(AXIS_TILES),      # rd
        P(AXIS_TILES),      # target
    )
    out_specs = (P(), P())
    step = jax.shard_map(
        shard_step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(step)
