"""Counter-based RNG key discipline.

The reference re-constructs a ``std::default_random_engine`` seeded from the
wall clock at every call site (quirk Q1; reference main.cpp:127-131,323-326,
Mylight.cpp:107-108, BRDF.cpp:38-39) — irreproducible and correlated within a
clock tick. The TPU-native design replaces it with jax's counter-based
threefry: one base key per render, deterministically folded by
(pixel/ray id, sample id, bounce, purpose). This makes CPU-oracle vs TPU
image comparison exact-stream and gradients reproducible (SURVEY.md §7 Q1).

Purpose constants keep independent decision streams decorrelated without
splitting keys inside the hot loop (fold_in is a cheap hash, vmap-safe).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Purpose tags — one per independent random decision in the estimators.
P_LOBE = 0          # diffuse-vs-specular lobe choice (BRDF.cpp:38-41)
P_BSDF = 1          # BRDF lobe warp (xi1, xi2)            (BRDF.cpp:48-100)
P_LIGHT_SELECT = 2  # light class / triangle categorical   (Mylight.cpp:112-135, 435-438)
P_LIGHT_WARP = 3    # point-in-triangle / Arvo warp        (Mylight.cpp:141-149, 449-461)
P_RR = 4            # Russian roulette                     (main.cpp:321-329)
P_PIXEL_JITTER = 5  # sub-pixel jitter for anti-aliasing (new capability)


def base_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def bounce_key(key: jax.Array, bounce, purpose: int) -> jax.Array:
    """Key for a whole wavefront at a given bounce and purpose.

    Per-ray decorrelation comes from the ray-id axis via
    :func:`uniform_per_ray`, not from per-ray key splitting — folding a
    scalar key is O(1) instead of O(N) threefry invocations.
    """
    return jax.random.fold_in(jax.random.fold_in(key, bounce), purpose)


def sample_key(key: jax.Array, sample_id) -> jax.Array:
    """Key for one spp chunk (sample index folded in)."""
    return jax.random.fold_in(key, sample_id)


def uniform(key: jax.Array, shape, minval=0.0, maxval=1.0) -> jnp.ndarray:
    return jax.random.uniform(key, shape, minval=minval, maxval=maxval, dtype=jnp.float32)
