"""Low-discrepancy sampling: vectorized Halton sequence + hemisphere mapping.

TPU-native rewrite of the device sampling library in
reference: MetalRaytracing/Raytracing.metal:27-147.  Everything is batched over
a ray/pixel axis so a single call serves the whole wavefront; the scalar
while-loop of the reference becomes a fixed-trip unrolled digit loop (static
shapes for XLA).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# First 100 primes (reference: Raytracing.metal:27-33).
PRIMES = np.array([
    2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67, 71,
    73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131, 137, 139, 149, 151,
    157, 163, 167, 173, 179, 181, 191, 193, 197, 199, 211, 223, 227, 229, 233,
    239, 241, 251, 257, 263, 269, 271, 277, 281, 283, 293, 307, 311, 313, 317,
    331, 337, 347, 349, 353, 359, 367, 373, 379, 383, 389, 397, 401, 409, 419,
    421, 431, 433, 439, 443, 449, 457, 461, 463, 467, 479, 487, 491, 499, 503,
    509, 521, 523, 541,
], dtype=np.int32)

# Halton indices are offset + frame_index where offset < 2^20
# (reference: Renderer.swift:263-270) and frame_index is bounded by the sample
# count; 2^26 gives generous headroom for the digit-count bound below.
_MAX_INDEX = 1 << 26


def halton(i: jnp.ndarray, d: int) -> jnp.ndarray:
    """Radical inverse of index array ``i`` in the base of the d'th prime.

    Element-wise parity with ``halton(int i, short d)``
    (reference: Raytracing.metal:41-56): float32 accumulation, f *= 1/b per
    digit.  The reference's data-dependent ``while (i > 0)`` becomes a fixed
    digit count — extra iterations contribute f * 0 and leave the result
    bit-identical.
    """
    b = int(PRIMES[d])
    n_digits = int(np.ceil(np.log(_MAX_INDEX) / np.log(b)))
    i = i.astype(jnp.int32)
    inv_b = jnp.float32(1.0) / jnp.float32(b)
    f = jnp.full(i.shape, 1.0, jnp.float32)
    r = jnp.zeros(i.shape, jnp.float32)
    for _ in range(n_digits):
        f = f * inv_b
        # One constant division per digit: the remainder comes from the
        # quotient (i - q*b) instead of a second magic-number divide —
        # integer multiplies are the expensive op on the TPU's f32 VPU.
        q = i // b
        r = r + f * (i - q * b).astype(jnp.float32)
        i = q
    return r


def halton2(i: jnp.ndarray, d: int) -> jnp.ndarray:
    """Two consecutive Halton dimensions stacked on the last axis."""
    return jnp.stack([halton(i, d), halton(i, d + 1)], axis=-1)


# Dimension schedule (reference: Raytracing.metal:202-203, 272, 284-285,
# 384-385): d=0,1 pixel jitter; per bounce b the block 2 + 5*b + k with
# k=0 light select, k=1,2 light surface uv, k=3,4 bounce direction uv.
DIM_PIXEL_X = 0
DIM_PIXEL_Y = 1


def bounce_dim(bounce: int, k: int) -> int:
    return 2 + 5 * bounce + k


def sample_cosine_weighted_hemisphere(u: jnp.ndarray) -> jnp.ndarray:
    """Map uniform (N, 2) to cosine-weighted directions about +Y
    (reference: Raytracing.metal:78-88)."""
    phi = 2.0 * jnp.pi * u[..., 0]
    cos_phi = jnp.cos(phi)
    sin_phi = jnp.sin(phi)
    cos_theta = jnp.sqrt(u[..., 1])
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    return jnp.stack(
        [sin_theta * cos_phi, cos_theta, sin_theta * sin_phi], axis=-1)


def align_hemisphere_with_normal(sample: jnp.ndarray,
                                 normal: jnp.ndarray) -> jnp.ndarray:
    """Rotate +Y-hemisphere samples onto the surface normal using the
    reference's fixed tangent seed (0.0072, 1, 0.0034)
    (reference: Raytracing.metal:132-147)."""
    up = normal
    seed = jnp.asarray([0.0072, 1.0, 0.0034], jnp.float32)
    right = jnp.cross(normal, seed)
    right = right / jnp.linalg.norm(right, axis=-1, keepdims=True)
    forward = jnp.cross(right, up)
    return (sample[..., 0:1] * right
            + sample[..., 1:2] * up
            + sample[..., 2:3] * forward)


def pixel_decorrelation_offsets(key, shape, bits: int = 20) -> jnp.ndarray:
    """Per-pixel random Halton index offsets — the reference fills an r32Uint
    texture with ``arc4random() % (1 << 20)`` (reference: Renderer.swift:249-274)."""
    import jax

    return jax.random.randint(key, shape, 0, 1 << bits, dtype=jnp.int32)
