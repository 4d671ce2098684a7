"""Pinhole camera and primary-ray generation (reference main.cpp:497-564).

Reference construction, replicated exactly:
    N = normalize(lookat - eye); V = normalize(N x up); U = normalize(V x N)
    delta(i,j) = (-pixel_len*(i-(h-1)/2), pixel_len*(j-(w-1)/2), 0)
    dir = normalize(U*delta.x + V*delta.y + N*dist)
with pixel_len = tan_half_fovy * dist / (h/2). The correct model uses
tan(radians(fovy)/2); quirk Q2 (main.cpp:547) omits the degree->radian
conversion — ``fov_bug_compat`` reproduces tan(fovy/360) for golden-image
parity (the reference's 720-row "/360" IS h/2, so only the missing pi/180
is the bug).

The "2x distance" experiment (main.cpp:509-510: start -= w; w *= 2) is
:func:`push_back_camera`.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from monte_carlo_path_tracing_tpu.core import rng, vecmath as vm
from monte_carlo_path_tracing_tpu.scene.types import Camera


def push_back_camera(cam: Camera, factor: float = 2.0) -> Camera:
    """Move the eye to `factor`x the lookat distance (main.cpp:509-510)."""
    w = cam.lookat - cam.eye
    return dataclasses.replace(cam, eye=cam.lookat - factor * w)


def camera_basis(cam: Camera):
    w = cam.lookat - cam.eye
    dist = vm.norm(w)
    n = w / dist
    v = vm.normalize(jnp.cross(n, cam.up))
    u = vm.normalize(jnp.cross(v, n))
    return u, v, n, dist


def pixel_len(cam: Camera, dist: jnp.ndarray) -> jnp.ndarray:
    if cam.fov_bug_compat:
        tan_half = jnp.tan(cam.fovy_deg / 360.0)          # Q2: degrees as radians
    else:
        tan_half = jnp.tan(cam.fovy_deg * (math.pi / 360.0))
    return tan_half * dist / (cam.height / 2.0)


def generate_rays(
    cam: Camera,
    pixel_idx: jnp.ndarray,
    jitter_key: jax.Array | None = None,
):
    """Primary rays for flat pixel indices i*width + j (row-major, row 0 at
    the image top as in the reference's framebuffer loop, main.cpp:557-564).

    Returns (ro[N,3], rd[N,3]). Without a jitter key every sample of a pixel
    shares one direction — exactly the reference (its 10 spp all re-trace
    the same primary ray); with one, positions are jittered in the pixel
    footprint for antialiasing (a new capability).
    """
    u, v, n, dist = camera_basis(cam)
    plen = pixel_len(cam, dist)

    i = (pixel_idx // cam.width).astype(jnp.float32)
    j = (pixel_idx % cam.width).astype(jnp.float32)
    if jitter_key is not None:
        off = rng.uniform(jitter_key, (pixel_idx.shape[0], 2), -0.5, 0.5)
        i = i + off[:, 0]
        j = j + off[:, 1]

    dx = -plen * (i - (cam.height - 1) / 2.0)
    dy = plen * (j - (cam.width - 1) / 2.0)
    rd = vm.normalize(
        dx[:, None] * u[None] + dy[:, None] * v[None] + dist * n[None]
    )
    ro = jnp.broadcast_to(cam.eye, rd.shape)
    return ro, rd
