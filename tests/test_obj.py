"""Loader tests against the reference asset zoo (SURVEY.md §4 item 2).

Face/material counts come from the reference Resources/ directory
(``grep -c '^f '``); tests skip gracefully when the mirror is absent.
"""

import os

import numpy as np
import pytest

from metal_raytracing_tpu.io import procedural
from metal_raytracing_tpu.io.obj import load_obj

RES = "/root/reference/Resources"
needs_assets = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference Resources not available")


@needs_assets
def test_plane_quad_triangulation():
    m = load_obj(os.path.join(RES, "plane.obj"))
    assert m.face_count == 1  # one quad face
    assert m.triangle_count == 2  # fan-triangulated
    assert len(m.submeshes) == 1
    assert m.positions.shape == (4, 3)
    np.testing.assert_allclose(m.submeshes[0].material.base_color, (0.5,) * 3)
    # explicit normal (0, 1, 0)
    np.testing.assert_allclose(m.normals[0], (0.0, 1.0, 0.0))


@needs_assets
def test_sphere_counts():
    m = load_obj(os.path.join(RES, "sphere.obj"))
    assert m.face_count == 2500
    assert m.triangle_count > 2500  # quads split into 2 tris (minus tri rows)


@needs_assets
def test_train_submeshes():
    m = load_obj(os.path.join(RES, "train.obj"))
    assert m.face_count == 1816
    assert len(m.submeshes) == 6  # six usemtl groups (multi-submesh case)
    names = {s.material_name for s in m.submeshes}
    assert len(names) == 6


@needs_assets
def test_treefir_materials():
    m = load_obj(os.path.join(RES, "treefir.obj"))
    assert m.face_count == 176
    assert len(m.submeshes) == 2


@needs_assets
def test_teapot_synthesized_normals():
    m = load_obj(os.path.join(RES, "teapot.obj"))
    assert m.face_count == 8028
    # teapot.obj ships no vn records -> smooth normals are synthesized
    lens = np.linalg.norm(m.normals, axis=1)
    used = np.unique(np.concatenate(
        [s.tri_norm_idx.ravel() for s in m.submeshes]))
    np.testing.assert_allclose(lens[used], 1.0, atol=1e-4)


def test_negative_and_split_indices(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vn 0 0 1\n"
        "f -3//-1 -2//-1 -1//-1\n")
    m = load_obj(str(p))
    assert m.triangle_count == 1
    np.testing.assert_array_equal(m.submeshes[0].tri_pos_idx, [[0, 1, 2]])
    np.testing.assert_array_equal(m.submeshes[0].tri_norm_idx, [[0, 0, 0]])


def test_mtl_parsing(tmp_path):
    (tmp_path / "m.mtl").write_text(
        "newmtl red\nKd 1 0 0\nKs 0.5 0.5 0.5\nKe 0.1 0.2 0.3\n"
        "Ns 30\nNi 1.45\nd 0.9\n")
    (tmp_path / "t.obj").write_text(
        "mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nusemtl red\nf 1 2 3\n")
    m = load_obj(str(tmp_path / "t.obj"))
    mat = m.submeshes[0].material
    assert mat.base_color == (1.0, 0.0, 0.0)
    assert mat.specular == (0.5, 0.5, 0.5)
    assert mat.emission == pytest.approx((0.1, 0.2, 0.3))
    assert mat.specular_exponent == 30.0
    assert mat.refraction_index == 1.45
    assert mat.dissolve == 0.9


def test_mixed_normal_indices(tmp_path):
    """Faces mixing 'i//k' and bare 'i' forms, with MORE positions than vn
    records: the fallback must index synthesized normals appended after the
    vn array, not alias position indices into it (ADVICE.md round 1)."""
    p = tmp_path / "mixed.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 2 0 0\nv 2 1 0\nv 3 0 0\n"
        "vn 0 0 1\n"  # 6 positions > 1 vn: old bug -> IndexError/garbage
        "f 1//1 2//1 3//1\n"  # uses the file normal
        "f 4 6 5\n")  # no normal indices -> synthesized fallback
    m = load_obj(str(p))
    assert m.triangle_count == 2
    subs = m.submeshes[0]
    # face 1 keeps the explicit vn index
    np.testing.assert_array_equal(subs.tri_norm_idx[0], [0, 0, 0])
    # face 2 falls back to synthesized normals stored after the 1 vn entry
    assert (subs.tri_norm_idx[1] >= 1).all()
    assert subs.tri_norm_idx.max() < m.normals.shape[0]
    n = m.normals[subs.tri_norm_idx[1]]
    # face (4, 6, 5) = ((2,0,0),(3,0,0),(2,1,0)) is CCW in the XY plane
    np.testing.assert_allclose(n, [[0, 0, 1]] * 3, atol=1e-6)


@pytest.mark.parametrize("name", procedural.available())
def test_procedural_models_well_formed(name):
    m = procedural.make_model(name)
    assert m.triangle_count > 0
    assert np.isfinite(m.positions).all()
    for s in m.submeshes:
        assert s.tri_pos_idx.min() >= 0
        assert s.tri_pos_idx.max() < m.positions.shape[0]
    lens = np.linalg.norm(m.normals, axis=1)
    assert (lens < 1.0 + 1e-4).all()


def test_procedural_dragon_is_high_poly():
    m = procedural.make_model("dragon")
    assert m.triangle_count >= 50_000  # benchmark-grade stand-in
