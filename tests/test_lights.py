"""Light sampling golden tests (reference math: Raytracing.metal:94-128,
281-327)."""

import jax.numpy as jnp
import numpy as np
import pytest

from metal_raytracing_tpu.lights import sample_lights, select_light
from metal_raytracing_tpu.types import (
    area_light, pack_lights, point_light, spot_light, sun_light)


def _table(*lights):
    return pack_lights(list(lights))


def test_select_light():
    u = jnp.asarray([0.0, 0.49, 0.5, 0.999, 1.0])
    idx = np.asarray(select_light(u, 2))
    np.testing.assert_array_equal(idx, [0, 0, 1, 1, 1])  # clamped to count-1


def test_area_light_math():
    lights = _table(area_light(position=(0.0, 2.0, 0.0),
                               forward=(0.0, -1.0, 0.0),
                               right=(0.5, 0.0, 0.0), up=(0.0, 0.0, 0.5),
                               color=(4.0, 4.0, 4.0)))
    pos = jnp.asarray([[0.0, 0.0, 0.0]])
    # u = (0.5, 0.5) maps to the light center (u*2-1 = 0)
    s = sample_lights(lights, jnp.zeros((1,), jnp.int32),
                      jnp.full((1, 2), 0.5), pos)
    np.testing.assert_allclose(np.asarray(s.direction), [[0.0, 1.0, 0.0]],
                               atol=1e-6)
    assert float(s.distance[0]) == pytest.approx(2.0)
    # falloff 1/4, emitter cosine dot(-L, forward) = 1 -> color 4/4 = 1
    np.testing.assert_allclose(np.asarray(s.color), [[1.0, 1.0, 1.0]],
                               rtol=1e-6)
    # corner sample: u = (1, 1) -> sample at position + right + up
    s2 = sample_lights(lights, jnp.zeros((1,), jnp.int32),
                       jnp.ones((1, 2)), pos)
    expect_point = np.array([0.5, 2.0, 0.5])
    dist = np.linalg.norm(expect_point)
    assert float(s2.distance[0]) == pytest.approx(dist, rel=1e-6)
    # emitter cosine < 1 off-axis
    cosine = np.dot(expect_point / dist, np.array([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(np.asarray(s2.color)[0],
                               4.0 / dist**2 * cosine, rtol=1e-5)


def test_point_light_inverse_square():
    lights = _table(point_light(position=(0.0, 3.0, 0.0), color=(9.0, 9.0, 9.0)))
    s = sample_lights(lights, jnp.zeros((1,), jnp.int32),
                      jnp.full((1, 2), 0.5), jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(s.color), [[1.0, 1.0, 1.0]],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.direction), [[0.0, 1.0, 0.0]],
                               atol=1e-6)


def test_spot_light_cone():
    lights = _table(spot_light(position=(0.0, 2.0, 0.0),
                               direction=(0.0, -1.0, 0.0),
                               cone_angle=np.pi / 8, color=(4.0, 4.0, 4.0)))
    inside = jnp.asarray([[0.0, 0.0, 0.0]])  # straight below: in cone
    outside = jnp.asarray([[5.0, 0.0, 0.0]])  # far off-axis: outside cone
    s_in = sample_lights(lights, jnp.zeros((1,), jnp.int32),
                         jnp.full((1, 2), 0.5), inside)
    s_out = sample_lights(lights, jnp.zeros((1,), jnp.int32),
                          jnp.full((1, 2), 0.5), outside)
    np.testing.assert_allclose(np.asarray(s_in.color), [[1.0, 1.0, 1.0]],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s_out.color), 0.0)


def test_sun_light():
    lights = _table(sun_light(direction=(-1.0, -2.0, 0.0), color=(1.0, 0.5, 0.25)))
    s = sample_lights(lights, jnp.zeros((1,), jnp.int32),
                      jnp.full((1, 2), 0.5), jnp.asarray([[7.0, 0.0, -3.0]]))
    expect = -np.array([-1.0, -2.0, 0.0]) / np.linalg.norm([-1.0, -2.0, 0.0])
    np.testing.assert_allclose(np.asarray(s.direction)[0], expect, atol=1e-6)
    assert not np.isfinite(float(s.distance[0]))  # infinite distance
    np.testing.assert_allclose(np.asarray(s.color), [[1.0, 0.5, 0.25]])


def test_mixed_table_gather():
    lights = _table(
        point_light(position=(0.0, 1.0, 0.0), color=(1.0, 1.0, 1.0)),
        sun_light(direction=(0.0, -1.0, 0.0), color=(2.0, 2.0, 2.0)))
    idx = jnp.asarray([0, 1], jnp.int32)
    s = sample_lights(lights, idx, jnp.full((2, 2), 0.5), jnp.zeros((2, 3)))
    assert np.isfinite(float(s.distance[0]))
    assert not np.isfinite(float(s.distance[1]))
