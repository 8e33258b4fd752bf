"""Wavefront OBJ/MTL loader.

TPU-native replacement for the ModelIO import pipeline the reference leans on
(reference: MetalRaytracing/Model.swift:13-24 uses MDLAsset -> MTKMesh; the
MTL -> Material conversion is reference: SubMesh.swift:37-54).  Emits flat
numpy arrays ready to be pre-transformed and concatenated into the global
scene SoA (no MTLBuffer/argument-table indirection — offsets replace
pointers).

Supported surface:
- v / vn / vt records (f32)
- f records in all index forms (``i``, ``i/j``, ``i//k``, ``i/j/k``) with
  1-based and negative indexing
- arbitrary polygon faces, fan-triangulated (plane.obj ships quads:
  reference: Resources/plane.obj:16)
- per-``usemtl`` submesh split, matching how MTKMesh splits submeshes
- mtllib material files with Kd/Ks/Ke/Ns/Ni/d fields
- smooth vertex-normal synthesis (area-weighted) when the OBJ has no ``vn``
  (teapot.obj ships none)

A fast native C++ parser (native/objparse.cpp) is used automatically when its
shared library has been built; this module is the always-available fallback
and the correctness oracle for it.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..types import Material


@dataclasses.dataclass
class SubmeshData:
    """One per-material slice of a model — the loader-level equivalent of
    ``Submesh`` (reference: SubMesh.swift:10-34)."""

    material_name: str
    material: Material
    # (T, 3) int32 indices into the model's position / normal arrays.
    tri_pos_idx: np.ndarray
    tri_norm_idx: np.ndarray
    tri_uv_idx: Optional[np.ndarray] = None  # (T, 3) or None

    @property
    def triangle_count(self) -> int:
        return int(self.tri_pos_idx.shape[0])


@dataclasses.dataclass
class LoadedModel:
    """A parsed OBJ: shared vertex arrays + per-material submeshes."""

    name: str
    positions: np.ndarray  # (V, 3) f32
    normals: np.ndarray  # (VN, 3) f32 (synthesized per-vertex if absent)
    texcoords: Optional[np.ndarray]  # (VT, 2) f32 or None
    submeshes: List[SubmeshData]
    face_count: int = 0  # original polygon count (pre-triangulation)

    @property
    def triangle_count(self) -> int:
        return sum(s.triangle_count for s in self.submeshes)


def load_mtl(path: str) -> Dict[str, Material]:
    """Parse an MTL file into Material records.

    Field mapping matches the reference's MDLMaterial conversion
    (reference: SubMesh.swift:37-54): Kd base color, Ks specular, Ke emission,
    Ns specular exponent, Ni index of refraction, d dissolve.
    """
    materials: Dict[str, Material] = {}
    cur: Optional[dict] = None

    mtl_dir = os.path.dirname(os.path.abspath(path))

    def flush():
        if cur is not None:
            materials[cur["name"]] = Material(
                base_color=tuple(cur["Kd"]),
                specular=tuple(cur["Ks"]),
                emission=tuple(cur["Ke"]),
                specular_exponent=cur["Ns"],
                refraction_index=cur["Ni"],
                dissolve=cur["d"],
                name=cur["name"],
                texture=cur["map_Kd"],
            )

    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "newmtl":
                flush()
                cur = dict(name=parts[1] if len(parts) > 1 else "",
                           Kd=(0.0, 0.0, 0.0), Ks=(0.0, 0.0, 0.0),
                           Ke=(0.0, 0.0, 0.0), Ns=0.0, Ni=0.0, d=1.0,
                           map_Kd="")
            elif cur is None:
                continue
            elif key == "Kd":
                cur["Kd"] = tuple(float(x) for x in parts[1:4])
            elif key == "Ks":
                cur["Ks"] = tuple(float(x) for x in parts[1:4])
            elif key == "Ke":
                cur["Ke"] = tuple(float(x) for x in parts[1:4])
            elif key == "Ns":
                cur["Ns"] = float(parts[1])
            elif key == "Ni":
                cur["Ni"] = float(parts[1])
            elif key == "d":
                cur["d"] = float(parts[1])
            elif key == "map_Kd" and len(parts) > 1:
                # strip option/value pairs (-o u v w, -mm base gain, ...)
                # so the remaining tokens are the filename — which may
                # contain spaces (ADVICE round 2: parts[-1] mis-parsed
                # both spaced names and value-final options like -mm 0 1)
                toks = parts[1:]
                n_vals = {"-blendu": 1, "-blendv": 1, "-cc": 1,
                          "-clamp": 1, "-texres": 1, "-bm": 1,
                          "-mm": 2, "-o": 3, "-s": 3, "-t": 3}
                i = 0
                while i < len(toks) and toks[i] in n_vals:
                    i += 1 + n_vals[toks[i]]
                name = " ".join(toks[i:])
                if name:
                    cur["map_Kd"] = os.path.join(mtl_dir, name)
    flush()
    return materials


def _resolve(idx: int, count: int) -> int:
    """OBJ 1-based / negative index -> 0-based."""
    return idx - 1 if idx > 0 else count + idx


def load_obj(path: str, compute_normals: bool = True,
             use_native: Optional[bool] = None) -> LoadedModel:
    """Parse an OBJ file (plus its mtllib) into a LoadedModel.

    Uses the native C++ parser (native/objparse.cpp) when its shared library
    is available (built on demand); set ``MRT_NO_NATIVE=1`` or
    ``use_native=False`` to force the pure-Python path.
    """
    if use_native is None:
        use_native = not os.environ.get("MRT_NO_NATIVE")
    if use_native:
        from .native import parse_obj_native

        raw = parse_obj_native(path)
        if raw is not None:
            return _from_native(raw, path, compute_normals)
    return _load_obj_python(path, compute_normals)


def _from_native(raw, path: str, compute_normals: bool) -> LoadedModel:
    """Convert a native parse to LoadedModel with semantics identical to
    the pure-Python path (normal synthesis, uv gating, empty submeshes)."""
    base_dir = os.path.dirname(os.path.abspath(path))
    materials: Dict[str, Material] = {}
    for rel in raw.mtllibs:
        mtl_path = os.path.join(base_dir, rel)
        if os.path.exists(mtl_path):
            materials.update(load_mtl(mtl_path))

    pos = raw.positions
    have_normals = raw.normals.shape[0] > 0
    have_uv = raw.texcoords.shape[0] > 0

    synthesized = None
    need_synth = (not have_normals and compute_normals) or any(
        have_normals and (tn < 0).any() for _, _, tn, _ in raw.submeshes)
    if need_synth:
        all_tris = [[(int(a), -1, int(a)) for a in tri]
                    for _, tp, _, _ in raw.submeshes for tri in tp]
        synthesized = _smooth_vertex_normals(pos, all_tris)

    name = os.path.splitext(os.path.basename(path))[0]
    default_mat = Material(base_color=(1.0, 1.0, 1.0), name="default")
    submeshes: List[SubmeshData] = []
    mixed_fallback = False  # some faces have vn indices, some don't
    nvn = raw.normals.shape[0]
    for mat_name, tp, tn, tu in raw.submeshes:
        if tp.shape[0] == 0:
            continue
        if have_normals:
            if (tn < 0).any():
                # Fallback indices point at the synthesized per-position
                # normals appended AFTER the file's vn array (see
                # _load_obj_python); a plain position index would alias
                # into vn (IndexError when V > VN, wrong normals otherwise).
                mixed_fallback = True
                tri_nrm = np.where(tn < 0, tp + nvn, tn)
            else:
                tri_nrm = tn
        else:
            tri_nrm = tp.copy()
        has_uv = have_uv and (tu >= 0).all()
        submeshes.append(SubmeshData(
            material_name=mat_name,
            material=materials.get(mat_name, default_mat),
            tri_pos_idx=tp,
            tri_norm_idx=tri_nrm,
            tri_uv_idx=tu if has_uv else None,
        ))

    if have_normals:
        out_normals = (np.concatenate([raw.normals, synthesized], axis=0)
                       if mixed_fallback else raw.normals)
    elif synthesized is not None:
        out_normals = synthesized
    else:
        out_normals = np.zeros_like(pos)
    return LoadedModel(
        name=name, positions=pos, normals=out_normals,
        texcoords=raw.texcoords if have_uv else None,
        submeshes=submeshes, face_count=raw.face_count,
    )


def _load_obj_python(path: str, compute_normals: bool = True) -> LoadedModel:
    """Pure-Python OBJ parse (fallback + correctness oracle)."""
    positions: List[Tuple[float, float, float]] = []
    normals: List[Tuple[float, float, float]] = []
    texcoords: List[Tuple[float, float]] = []
    materials: Dict[str, Material] = {}

    # submesh accumulation keyed by active material name
    order: List[str] = []
    tris_by_mat: Dict[str, List[List[Tuple[int, int, int]]]] = {}
    active = ""
    face_count = 0

    def bucket(name: str):
        if name not in tris_by_mat:
            tris_by_mat[name] = []
            order.append(name)
        return tris_by_mat[name]

    base_dir = os.path.dirname(os.path.abspath(path))
    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "v":
                positions.append(tuple(float(x) for x in parts[1:4]))
            elif key == "vn":
                normals.append(tuple(float(x) for x in parts[1:4]))
            elif key == "vt":
                texcoords.append(tuple(float(x) for x in parts[1:3]))
            elif key == "mtllib":
                mtl_path = os.path.join(base_dir, " ".join(parts[1:]))
                if os.path.exists(mtl_path):
                    materials.update(load_mtl(mtl_path))
            elif key == "usemtl":
                active = parts[1] if len(parts) > 1 else ""
                bucket(active)
            elif key == "f":
                face_count += 1
                corners = []
                for tok in parts[1:]:
                    fields = tok.split("/")
                    vi = _resolve(int(fields[0]), len(positions))
                    ti = (_resolve(int(fields[1]), len(texcoords))
                          if len(fields) > 1 and fields[1] else -1)
                    ni = (_resolve(int(fields[2]), len(normals))
                          if len(fields) > 2 and fields[2] else -1)
                    corners.append((vi, ti, ni))
                dst = bucket(active)
                # fan triangulation, matching ModelIO's behavior for quads
                for k in range(1, len(corners) - 1):
                    dst.append([corners[0], corners[k], corners[k + 1]])

    pos = np.asarray(positions, np.float32).reshape(-1, 3)
    nrm = (np.asarray(normals, np.float32).reshape(-1, 3)
           if normals else np.zeros((0, 3), np.float32))
    uv = (np.asarray(texcoords, np.float32).reshape(-1, 2)
          if texcoords else None)

    have_normals = nrm.shape[0] > 0
    synthesized = None
    if not have_normals and compute_normals:
        synthesized = _smooth_vertex_normals(
            pos, [t for name in order for t in tris_by_mat[name]])

    name = os.path.splitext(os.path.basename(path))[0]
    submeshes: List[SubmeshData] = []
    default_mat = Material(base_color=(1.0, 1.0, 1.0), name="default")
    mixed_fallback = False  # some faces have vn indices, some don't
    for mat_name in order:
        tris = tris_by_mat[mat_name]
        if not tris:
            continue
        t = np.asarray(tris, np.int64)  # (T, 3 corners, 3 fields)
        tri_pos = t[:, :, 0].astype(np.int32)
        if have_normals:
            tri_nrm = t[:, :, 2].astype(np.int32)
            if (tri_nrm < 0).any():
                # Faces missing normal indices fall back to synthesized
                # per-position normals, which are APPENDED after the file's
                # vn array — so the fallback index is position + len(vn)
                # (a plain position index would alias into the vn array).
                if synthesized is None:
                    synthesized = _smooth_vertex_normals(
                        pos, [x for nm in order for x in tris_by_mat[nm]])
                mixed_fallback = True
                tri_nrm = np.where(tri_nrm < 0, tri_pos + nrm.shape[0],
                                   tri_nrm)
        else:
            tri_nrm = tri_pos.copy()
        tri_uv = t[:, :, 1].astype(np.int32)
        has_uv = uv is not None and (tri_uv >= 0).all()
        submeshes.append(SubmeshData(
            material_name=mat_name,
            material=materials.get(mat_name, default_mat),
            tri_pos_idx=tri_pos,
            tri_norm_idx=tri_nrm,
            tri_uv_idx=tri_uv if has_uv else None,
        ))

    if have_normals:
        out_normals = (np.concatenate([nrm, synthesized], axis=0)
                       if mixed_fallback else nrm)
    else:
        out_normals = (synthesized if synthesized is not None
                       else np.zeros_like(pos))
    return LoadedModel(
        name=name, positions=pos, normals=out_normals, texcoords=uv,
        submeshes=submeshes, face_count=face_count,
    )


def _smooth_vertex_normals(pos: np.ndarray, tris) -> np.ndarray:
    """Area-weighted smooth per-vertex normals for OBJs without ``vn``."""
    n = np.zeros_like(pos)
    if tris:
        t = np.asarray(tris, np.int64)[:, :, 0]
        v0, v1, v2 = pos[t[:, 0]], pos[t[:, 1]], pos[t[:, 2]]
        face_n = np.cross(v1 - v0, v2 - v0)  # magnitude ∝ 2*area
        for c in range(3):
            np.add.at(n, t[:, c], face_n)
    lens = np.linalg.norm(n, axis=1, keepdims=True)
    return (n / np.maximum(lens, 1e-20)).astype(np.float32)
