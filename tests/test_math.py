"""TRS / matrix semantics tests (reference: Utilities.swift:113-172,
Mesh.swift:21-24)."""

import numpy as np

from metal_raytracing_tpu import math_utils as mu


def test_translate_scale():
    m = mu.trs((1.0, 2.0, 3.0), (0, 0, 0), 2.0)
    p = mu.transform_points(m, np.array([[1.0, 1.0, 1.0]]))
    np.testing.assert_allclose(p, [[3.0, 4.0, 5.0]])


def test_rotation_axis_angle():
    m = mu.rotate_y(np.pi / 2)
    p = mu.transform_points(m, np.array([[1.0, 0.0, 0.0]]))
    # right-handed: +X rotates toward -Z under +90deg about Y
    np.testing.assert_allclose(p, [[0.0, 0.0, -1.0]], atol=1e-6)


def test_euler_order_xyz():
    r = (0.3, -0.7, 1.1)
    m = mu.rotate_euler_xyz(r)
    expected = mu.rotate_x(r[0]) @ mu.rotate_y(r[1]) @ mu.rotate_z(r[2])
    np.testing.assert_allclose(m, expected, atol=1e-6)


def test_trs_composition_order():
    # T @ R @ S: scale first, then rotate, then translate
    m = mu.trs((5.0, 0.0, 0.0), (0.0, np.pi / 2, 0.0), 2.0)
    p = mu.transform_points(m, np.array([[1.0, 0.0, 0.0]]))
    np.testing.assert_allclose(p, [[5.0, 0.0, -2.0]], atol=1e-6)


def test_directions_ignore_translation():
    m = mu.trs((100.0, -3.0, 7.0), (0.0, 0.0, 0.0), 1.0)
    d = mu.transform_directions(m, np.array([[0.0, 1.0, 0.0]]))
    np.testing.assert_allclose(d, [[0.0, 1.0, 0.0]])
