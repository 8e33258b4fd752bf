"""Native C++ OBJ parser parity vs the pure-Python oracle."""

import os

import numpy as np
import pytest

from metal_raytracing_tpu.io.native import load_library, parse_obj_native
from metal_raytracing_tpu.io.obj import _load_obj_python, load_obj

RES = "/root/reference/Resources"

pytestmark = pytest.mark.skipif(
    load_library() is None, reason="native parser could not be built")


def _assert_models_equal(a, b):
    np.testing.assert_array_equal(a.positions, b.positions)
    np.testing.assert_array_equal(a.normals, b.normals)
    assert a.face_count == b.face_count
    assert len(a.submeshes) == len(b.submeshes)
    for sa, sb in zip(a.submeshes, b.submeshes):
        assert sa.material_name == sb.material_name
        assert sa.material == sb.material
        np.testing.assert_array_equal(sa.tri_pos_idx, sb.tri_pos_idx)
        np.testing.assert_array_equal(sa.tri_norm_idx, sb.tri_norm_idx)
        if sa.tri_uv_idx is None:
            assert sb.tri_uv_idx is None
        else:
            np.testing.assert_array_equal(sa.tri_uv_idx, sb.tri_uv_idx)


@pytest.mark.skipif(not os.path.isdir(RES), reason="no reference assets")
@pytest.mark.parametrize(
    "name", ["plane", "plane-back", "sphere", "train", "treefir", "teapot"])
def test_native_matches_python_on_reference_assets(name):
    path = os.path.join(RES, f"{name}.obj")
    native = load_obj(path, use_native=True)
    python = _load_obj_python(path)
    _assert_models_equal(native, python)


def test_native_matches_python_synthetic(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text(
        "mtllib t.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "vt 0 0\nvt 1 0\nvt 0 1\nvt 1 1\n"
        "vn 0 0 1\n"
        "usemtl a\nf 1/1/1 2/2/1 4/4/1 3/3/1\n"
        "usemtl b\nf -4//-1 -3//-1 -2//-1\n")
    (tmp_path / "t.mtl").write_text(
        "newmtl a\nKd 1 0 0\nnewmtl b\nKd 0 1 0\n")
    native = load_obj(str(p), use_native=True)
    python = _load_obj_python(str(p))
    _assert_models_equal(native, python)
    assert native.submeshes[0].material.base_color == (1.0, 0.0, 0.0)
    assert native.face_count == 2
    assert native.triangle_count == 3  # quad fan + tri


def test_native_parse_speed_smoke():
    raw = parse_obj_native(os.path.join(RES, "teapot.obj")) if \
        os.path.isdir(RES) else None
    if raw is None:
        pytest.skip("no assets")
    assert raw.face_count == 8028
