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
# (reference: Renderer.swift:263-270) and frame_index is bounded by the
# sample count; 2^22 leaves > 2M-sample headroom over the 2^21 offset cap
# below while keeping the fixed digit counts (and hence the digit-loop
# trip counts) ~20% shorter than the old 2^26 bound.  The f32 digit loop
# in :func:`halton` additionally RELIES on indices < 2^22: that is what
# bounds the floor(x/b) rounding error under one (see the proof inline).
_MAX_INDEX_BITS = 22
_MAX_INDEX = 1 << _MAX_INDEX_BITS


def _halton_base2(i: jnp.ndarray) -> jnp.ndarray:
    """Base-2 radical inverse = bit reversal: ~15 cheap int ops instead of
    26 digit-loop iterations (each with a magic-number divide).

    For i < 2^24 this is BIT-EXACT with the reference's sequential f32
    accumulation (every partial sum spans <= 24 mantissa bits, so no add
    ever rounds — and all real render indices are < 2^21: offsets are
    capped at 2^20 plus a bounded frame index).  Past 2^24 the single
    final rounding can differ from the loop's per-add rounding by 1 ulp
    (~6e-8), far inside every parity budget."""
    v = i.astype(jnp.uint32)
    v = ((v & 0x55555555) << 1) | ((v >> 1) & 0x55555555)
    v = ((v & 0x33333333) << 2) | ((v >> 2) & 0x33333333)
    v = ((v & 0x0F0F0F0F) << 4) | ((v >> 4) & 0x0F0F0F0F)
    v = ((v & 0x00FF00FF) << 8) | ((v >> 8) & 0x00FF00FF)
    v = (v << 16) | (v >> 16)
    v = v >> (32 - _MAX_INDEX_BITS)
    return v.astype(jnp.float32) * jnp.float32(2.0 ** -_MAX_INDEX_BITS)


def halton(i: jnp.ndarray, d: int) -> jnp.ndarray:
    """Radical inverse of index array ``i`` in the base of the d'th prime.

    Element-wise parity with ``halton(int i, short d)``
    (reference: Raytracing.metal:41-56): float32 accumulation, f *= 1/b per
    digit.  The reference's data-dependent ``while (i > 0)`` becomes a fixed
    digit count — extra iterations contribute f * 0 and leave the result
    bit-identical.  Base 2 (pixel-jitter x, the most-iterated base) takes
    the exact bit-reversal fast path.
    """
    b = int(PRIMES[d])
    i = i.astype(jnp.int32)
    if b == 2:
        return _halton_base2(i)
    n_digits = int(np.ceil(np.log(_MAX_INDEX) / np.log(b)))
    # All-f32 PAIRED digit loop: int32 divide/multiply lower to multi-pass
    # magic-number sequences on the TPU VPU, while f32 mul/floor/select
    # are single-pass.  Two digits are peeled per iteration via one
    # base-b^2 floor-divide (halving the serial quotient chain), and the
    # reference's running f *= 1/b products are precomputed as numpy-f32
    # scalar constants with the identical rounding sequence (the ladder is
    # index-independent), removing that chain entirely.
    #
    # Exactness: indices are < 2^22 (_MAX_INDEX) so x and every quotient
    # is an exact f32 integer; fl(x * fl(1/b^2)) carries combined relative
    # error <= ~2^-23, i.e. absolute error <= x * 2^-23 < 0.5, so the
    # floor is off by at most ONE either way and the single correction
    # below repairs it; the products q*b^2 of exact integers stay < 2^23
    # and are themselves exact, so the recovered base-b^2 remainder D is
    # the exact integer remainder.  The digit split D = d0 + b*d1 uses
    # the same argument (D < b^2 <= 541^2 < 2^19).  Digit VALUES are
    # therefore bit-identical to the reference's integer loop
    # (Raytracing.metal:41-56), and r accumulates one fl(f_k * d_k) add
    # per digit in the reference's order with the reference's exact f_k,
    # so the result bits are too (verified digit-by-digit in
    # tests/test_sampling.py against the scalar transcription).
    fs = []
    f_np = np.float32(1.0)
    inv_np = np.float32(1.0) / np.float32(b)
    for _ in range(n_digits):
        f_np = np.float32(f_np * inv_np)
        fs.append(float(f_np))
    b2 = b * b
    inv_b = float(inv_np)
    inv_b2 = float(np.float32(1.0) / np.float32(b2))
    bf = float(b)
    b2f = float(b2)

    def _divmod_f32(x, inv, base):
        q = jnp.floor(x * inv)
        rem = x - q * base
        low = rem < 0.0  # q one too large
        q = jnp.where(low, q - 1.0, q)
        rem = jnp.where(low, rem + base, rem)
        high = rem >= base  # q one too small
        q = jnp.where(high, q + 1.0, q)
        rem = jnp.where(high, rem - base, rem)
        return q, rem

    x = i.astype(jnp.float32)
    r = jnp.zeros(i.shape, jnp.float32)
    for k in range(0, n_digits, 2):
        if k + 1 < n_digits:
            x, big = _divmod_f32(x, inv_b2, b2f)  # big = x mod b^2
            d1, d0 = _divmod_f32(big, inv_b, bf)  # big = d0 + b*d1
            r = r + fs[k] * d0
            r = r + fs[k + 1] * d1
        else:  # odd final digit
            x, d0 = _divmod_f32(x, inv_b, bf)
            r = r + fs[k] * d0
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
    texture with ``arc4random() % (1 << 20)`` (reference: Renderer.swift:249-274).

    ``bits`` must leave headroom under ``_MAX_INDEX`` (offset + frame
    index): the fixed digit counts silently drop digits past it."""
    import jax

    if bits > 21:
        raise ValueError(
            f"rand_offset_bits {bits} leaves no frame-index headroom under "
            f"the Halton digit/exactness bound 2^{_MAX_INDEX_BITS} "
            f"(offset + frame index must stay below it)")
    return jax.random.randint(key, shape, 0, 1 << bits, dtype=jnp.int32)
