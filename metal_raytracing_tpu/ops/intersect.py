"""Vectorized intersection primitives: ray-AABB slabs and Moller-Trumbore.

The TPU building blocks that replace Metal's closed-source
``intersector<triangle_data, instancing>`` (used by the reference at
Raytracing.metal:230-244 for closest-hit and :360-367 for any-hit).  All
functions are pure jnp, broadcast over arbitrary leading batch shapes, and
NaN-safe so degenerate (padding) boxes and triangles can never report a hit.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["safe_inverse", "ray_aabb", "moller_trumbore", "BIG_T"]

# Stand-in for the reference's INFINITY max ray distance
# (Raytracing.metal:220) that stays finite under f32 arithmetic.  A Python
# float (not a jnp array) so Pallas kernels can use it without capturing a
# traced constant.
BIG_T = 1e30


def safe_inverse(d: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """1/d with zero components mapped to a huge finite value of matching
    sign, keeping slab arithmetic free of inf*0 NaNs."""
    tiny = jnp.abs(d) < eps
    safe_d = jnp.where(tiny, jnp.where(d < 0, -eps, eps), d)
    return 1.0 / safe_d


def ray_aabb(
    o: jnp.ndarray,  # (..., 3) ray origins
    inv_d: jnp.ndarray,  # (..., 3) inverse directions (safe_inverse)
    lo: jnp.ndarray,  # (..., 3) box min (broadcastable against o)
    hi: jnp.ndarray,  # (..., 3) box max
    t_max,  # (...) current closest-hit distance bound
    t_min=0.0,
):
    """Slab test. Returns ``(t_near, hit)`` with shapes ``(...)``.

    Explicitly rejects inverted boxes (``hi < lo``) — the empty-leaf sentinel
    the BVH build uses for padding clusters — which a bare min/max slab test
    would otherwise accept.
    """
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    valid = hi[..., 0] >= lo[..., 0]
    hit = (t_near <= t_far) & (t_far >= t_min) & (t_near <= t_max) & valid
    return t_near, hit


def moller_trumbore(
    o: jnp.ndarray,  # (..., 3)
    d: jnp.ndarray,  # (..., 3)
    v0: jnp.ndarray,  # (..., 3) broadcastable triangle data
    e1: jnp.ndarray,
    e2: jnp.ndarray,
    t_min=1e-6,
    t_max=BIG_T,
):
    """Double-sided Moller-Trumbore ray/triangle intersection.

    Returns ``(t, u, v, hit)``; the barycentric convention (point =
    v0 + u*e1 + v*e2) pairs weight u with corner 1 and v with corner 2 —
    matching Metal's ``triangle_barycentric_coord`` as consumed by
    ``interpolateVertexAttribute`` (reference: Raytracing.metal:60-73, where
    weights (u, v, 1-u-v) pair with vertex indices (3i+1, 3i+2, 3i+0)).
    Triangles are treated as opaque and double-sided, like the reference's
    ``force_opacity(opaque)`` intersector with no culling
    (Raytracing.metal:232-233).
    """
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = 1.0 / det  # det==0 -> inf; comparisons below reject via NaN/inf
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t <= t_max)
    )
    return t, u, v, hit
