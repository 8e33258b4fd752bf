"""Golden-math tests for the sampling library (SURVEY.md §4 item 1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from metal_raytracing_tpu import sampling


def halton_scalar(i: int, d: int) -> float:
    """Literal transcription of the reference algorithm
    (reference: Raytracing.metal:41-56) in float32 scalar arithmetic."""
    b = int(sampling.PRIMES[d])
    f = np.float32(1.0)
    inv_b = np.float32(1.0) / np.float32(b)
    r = np.float32(0.0)
    while i > 0:
        f = np.float32(f * inv_b)
        r = np.float32(r + f * np.float32(i % b))
        i = i // b
    return float(r)


@pytest.mark.parametrize("d", [0, 1, 2, 7, 50, 99])
def test_halton_matches_scalar_reference(d):
    # index range: offsets < 2^20 (guard in pixel_decorrelation_offsets)
    # plus a bounded frame index — 2^21+5 probes past every real index;
    # sampling._MAX_INDEX (2^22) is the supported ceiling.  BIT-exact:
    # the paired-digit f32 loop recovers the reference's exact digits and
    # accumulates them in the reference's order with its exact f ladder
    # (proof inline in sampling.halton), so equality is of bits, not
    # tolerance.  Checked densely (100 dims x 2k random indices) offline.
    idx = np.array([0, 1, 2, 3, 17, 100, 12345, (1 << 20) + 9, (1 << 21) + 5,
                    (1 << 22) - 1])
    ours = np.asarray(sampling.halton(jnp.asarray(idx), d))
    expected = np.array([halton_scalar(int(i), d) for i in idx], np.float32)
    assert (ours == expected).all()


def test_halton_range_and_discrepancy():
    idx = jnp.arange(1, 4097)
    vals = np.asarray(sampling.halton(idx, 0))
    assert (vals >= 0).all() and (vals < 1).all()
    # Low discrepancy: mean close to 0.5 already at 4k samples
    assert abs(vals.mean() - 0.5) < 1e-3


def test_cosine_hemisphere_distribution():
    u = jnp.stack([sampling.halton(jnp.arange(1, 20001), 2),
                   sampling.halton(jnp.arange(1, 20001), 3)], axis=-1)
    dirs = np.asarray(sampling.sample_cosine_weighted_hemisphere(u))
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5)
    assert (dirs[:, 1] >= 0).all()  # +Y hemisphere
    # E[cos theta] = 2/3 for pdf = cos/pi
    assert abs(dirs[:, 1].mean() - 2.0 / 3.0) < 5e-3


def test_align_hemisphere_with_normal():
    n = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0],
                     [0.577350, 0.577350, 0.577350]])
    sample = jnp.asarray([[0.0, 1.0, 0.0]] * 3)  # "up" must map onto normal
    out = np.asarray(sampling.align_hemisphere_with_normal(sample, n))
    np.testing.assert_allclose(out, np.asarray(n), atol=1e-6)

    # A full frame stays orthonormal: |aligned| == |sample|
    s2 = jnp.asarray([[0.5, 0.5, np.sqrt(0.5)]] * 3)
    out2 = np.asarray(sampling.align_hemisphere_with_normal(s2, n))
    np.testing.assert_allclose(np.linalg.norm(out2, axis=-1), 1.0, atol=1e-5)


def test_dimension_schedule():
    # reference: Raytracing.metal:272, 284-285, 384-385
    assert sampling.bounce_dim(0, 0) == 2
    assert sampling.bounce_dim(0, 4) == 6
    assert sampling.bounce_dim(1, 0) == 7
    assert sampling.bounce_dim(2, 4) == 16


def test_pixel_offsets_range():
    import jax

    offs = sampling.pixel_decorrelation_offsets(
        jax.random.PRNGKey(0), (1024,), bits=20)
    o = np.asarray(offs)
    assert o.min() >= 0 and o.max() < (1 << 20)
    assert len(np.unique(o)) > 900  # decorrelated


@pytest.mark.parametrize("d", [1, 2, 3, 4, 7, 20, 99])
def test_halton_f32_digit_loop_exact_remainders(d):
    """The all-f32 digit loop (floor(x/b) + one-ulp correction) must
    produce bit-identical results to exact integer digit math over the
    whole supported index range [0, 2^22) — this is what licenses the
    TPU-side replacement of magic-number int divides.  Random coverage
    plus the hostile boundary cases (exact multiples of b and their
    neighbors, where a floor off-by-one would flip a digit)."""
    b = int(sampling.PRIMES[d])
    rng = np.random.RandomState(d)
    idx = rng.randint(0, sampling._MAX_INDEX, size=20000)
    mult = (np.arange(1, 2000) * b * 37) % sampling._MAX_INDEX
    idx = np.concatenate([idx, mult, mult + 1, mult - 1,
                          [0, 1, b, b - 1, b + 1, sampling._MAX_INDEX - 1]])
    idx = idx.astype(np.int64)

    # exact integer-math reference, vectorized (f32 accumulation order
    # identical to the reference scalar loop)
    n_digits = int(np.ceil(np.log(sampling._MAX_INDEX) / np.log(b)))
    inv_b = np.float32(1.0) / np.float32(b)
    f = np.float32(1.0)
    r = np.zeros(idx.shape, np.float32)
    ii = idx.copy()
    for _ in range(n_digits):
        f = np.float32(f * inv_b)
        r = (r + f * (ii % b).astype(np.float32)).astype(np.float32)
        ii //= b
    ours = np.asarray(sampling.halton(jnp.asarray(idx, jnp.int32), d))
    np.testing.assert_array_equal(ours, r)
