"""4x4 affine transform constructors and small vector helpers.

Numpy (host-side) equivalents of the simd extensions in
reference: MetalRaytracing/Utilities.swift:113-172.  These run at scene-build
time only — geometry is pre-transformed to world space before upload, so no
per-ray matrix math survives into the device hot path.
"""

from __future__ import annotations

import numpy as np


def translate(t) -> np.ndarray:
    """Translation matrix (reference: Utilities.swift:114-121)."""
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = np.asarray(t, np.float32)
    return m


def rotate_axis_angle(radians: float, axis) -> np.ndarray:
    """Axis-angle rotation (reference: Utilities.swift:123-136)."""
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    ct, st = np.cos(radians), np.sin(radians)
    ci = 1.0 - ct
    x, y, z = axis
    m = np.array(
        [
            [ct + x * x * ci, x * y * ci - z * st, x * z * ci + y * st, 0],
            [y * x * ci + z * st, ct + y * y * ci, y * z * ci - x * st, 0],
            [z * x * ci - y * st, z * y * ci + x * st, ct + z * z * ci, 0],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )
    return m


def rotate_x(radians: float) -> np.ndarray:
    return rotate_axis_angle(radians, (1, 0, 0))


def rotate_y(radians: float) -> np.ndarray:
    return rotate_axis_angle(radians, (0, 1, 0))


def rotate_z(radians: float) -> np.ndarray:
    return rotate_axis_angle(radians, (0, 0, 1))


def rotate_euler_xyz(r) -> np.ndarray:
    """Euler rotation composed as Rx @ Ry @ Rz — the reference's
    ``rotate(_ r:)`` order (reference: Utilities.swift:150-152)."""
    rx, ry, rz = np.asarray(r, np.float32)
    return rotate_x(rx) @ rotate_y(ry) @ rotate_z(rz)


def scale(s) -> np.ndarray:
    """Scale matrix; accepts a scalar or a 3-vector
    (reference: Utilities.swift:154-165)."""
    s = np.asarray(s, np.float32)
    if s.ndim == 0:
        s = np.array([s, s, s], np.float32)
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[1, 1], m[2, 2] = s
    return m


def trs(position, rotation=(0.0, 0.0, 0.0), scale_=1.0) -> np.ndarray:
    """Compose T @ R @ S, matching ``Mesh.init``'s
    ``translationMatrix * rotationMatrix * scaleMatrix``
    (reference: Mesh.swift:21-24)."""
    return translate(position) @ rotate_euler_xyz(rotation) @ scale(scale_)


def transform_points(m: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Apply a 4x4 affine to (N, 3) points (w = 1)."""
    return pts @ m[:3, :3].T + m[:3, 3]


def transform_directions(m: np.ndarray, dirs: np.ndarray) -> np.ndarray:
    """Apply a 4x4 affine to (N, 3) directions (w = 0) — the reference
    transforms normals with the plain instance matrix, not its inverse
    transpose (reference: Raytracing.metal:267), so we match that."""
    return dirs @ m[:3, :3].T


def normalize(v: np.ndarray, axis: int = -1, eps: float = 0.0) -> np.ndarray:
    n = np.linalg.norm(v, axis=axis, keepdims=True)
    if eps:
        n = np.maximum(n, eps)
    return v / n
