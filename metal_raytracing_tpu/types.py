"""L1 shared scene/ABI types.

TPU-native equivalent of the Swift<->MSL shared header
(reference: MetalRaytracing/ShaderTypes.h:23-107).  Where the reference shares
C structs between host and device, we share JAX pytrees (NamedTuples of
arrays) between scene construction and jitted kernels.  Tables that the
reference stores as arrays-of-structs (lights, materials) become
structs-of-arrays — the layout the TPU VPU actually wants.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np


class LightType(enum.IntEnum):
    """Light type tags (reference: ShaderTypes.h:67-74)."""

    UNUSED = 0
    SUN = 1
    SPOT = 2
    POINT = 3
    AREA = 4


class Camera(NamedTuple):
    """Pinhole camera basis (reference: ShaderTypes.h:60-65).

    ``right``/``up`` are pre-scaled by the image-plane half extents, exactly as
    ``Scene.setupCamera`` does (reference: Scene.swift:40-57).
    """

    position: jnp.ndarray  # (3,) f32
    right: jnp.ndarray  # (3,) f32, scaled by image-plane half width
    up: jnp.ndarray  # (3,) f32, scaled by image-plane half height
    forward: jnp.ndarray  # (3,) f32


def make_camera(
    position=(0.0, 1.0, 5.38),
    right=(1.0, 0.0, 0.0),
    up=(0.0, 1.0, 0.0),
    forward=(0.0, 0.0, -1.0),
    fov_degrees: float = 45.0,
    aspect: float = 1.0,
) -> Camera:
    """Build a camera with image-plane scaled basis vectors.

    Mirrors ``Scene.setupCamera`` (reference: Scene.swift:40-57): the default
    pose is position (0, 1, 5.38) looking down -Z with a 45 degree vertical
    field of view; ``right`` is scaled by aspect * tan(fov/2), ``up`` by
    tan(fov/2).
    """
    half_h = float(np.tan(np.radians(fov_degrees) / 2.0))
    half_w = aspect * half_h
    return Camera(
        position=jnp.asarray(position, jnp.float32),
        right=jnp.asarray(right, jnp.float32) * half_w,
        up=jnp.asarray(up, jnp.float32) * half_h,
        forward=jnp.asarray(forward, jnp.float32),
    )


class Light(NamedTuple):
    """A single light (reference: ShaderTypes.h:76-87).

    The reference packs all light kinds into one struct with a type tag; we do
    the same so the light table is a rectangular SoA and the per-type shading
    switch can be a branchless ``jnp.select``.
    """

    type: jnp.ndarray  # () i32, LightType value
    position: jnp.ndarray  # (3,) f32
    color: jnp.ndarray  # (3,) f32
    forward: jnp.ndarray  # (3,) f32   (area light emitter normal)
    right: jnp.ndarray  # (3,) f32   (area light half-extent)
    up: jnp.ndarray  # (3,) f32   (area light half-extent)
    cone_angle: jnp.ndarray  # () f32    (spot light)
    direction: jnp.ndarray  # (3,) f32   (spot/sun)


def _light(
    type_, position=(0, 0, 0), color=(0, 0, 0), forward=(0, 0, 0),
    right=(0, 0, 0), up=(0, 0, 0), cone_angle=0.0, direction=(0, 0, 0),
) -> Light:
    return Light(
        type=jnp.asarray(int(type_), jnp.int32),
        position=jnp.asarray(position, jnp.float32),
        color=jnp.asarray(color, jnp.float32),
        forward=jnp.asarray(forward, jnp.float32),
        right=jnp.asarray(right, jnp.float32),
        up=jnp.asarray(up, jnp.float32),
        cone_angle=jnp.asarray(cone_angle, jnp.float32),
        direction=jnp.asarray(direction, jnp.float32),
    )


def area_light(position, forward, right, up, color) -> Light:
    """Factory mirroring ``Light.areaLight`` (reference: Scene.swift:71-81)."""
    return _light(LightType.AREA, position=position, color=color,
                  forward=forward, right=right, up=up)


def sun_light(direction, color) -> Light:
    """Factory mirroring ``Light.sunLight`` (reference: Scene.swift:83-89)."""
    return _light(LightType.SUN, direction=direction, color=color)


def point_light(position, color) -> Light:
    """Factory mirroring ``Light.pointLight`` (reference: Scene.swift:91-97)."""
    return _light(LightType.POINT, position=position, color=color)


def spot_light(position, direction, cone_angle, color) -> Light:
    """Factory mirroring ``Light.spotLight`` (reference: Scene.swift:99-107)."""
    return _light(LightType.SPOT, position=position, direction=direction,
                  cone_angle=cone_angle, color=color)


class LightTable(NamedTuple):
    """SoA light table — the device-side ``lightBuffer`` equivalent
    (reference: Scene.swift:32-33)."""

    type: jnp.ndarray  # (L,) i32
    position: jnp.ndarray  # (L, 3) f32
    color: jnp.ndarray  # (L, 3) f32
    forward: jnp.ndarray  # (L, 3) f32
    right: jnp.ndarray  # (L, 3) f32
    up: jnp.ndarray  # (L, 3) f32
    cone_angle: jnp.ndarray  # (L,) f32
    direction: jnp.ndarray  # (L, 3) f32

    @property
    def count(self) -> int:
        return int(self.type.shape[0])


def pack_lights(lights: Sequence[Light]) -> LightTable:
    """Stack individual lights into the SoA table."""
    if not lights:
        raise ValueError("scene needs at least one light")
    return LightTable(
        type=jnp.stack([l.type for l in lights]),
        position=jnp.stack([l.position for l in lights]),
        color=jnp.stack([l.color for l in lights]),
        forward=jnp.stack([l.forward for l in lights]),
        right=jnp.stack([l.right for l in lights]),
        up=jnp.stack([l.up for l in lights]),
        cone_angle=jnp.stack([l.cone_angle for l in lights]),
        direction=jnp.stack([l.direction for l in lights]),
    )


@dataclasses.dataclass(frozen=True)
class Material:
    """Host-side material record (reference: ShaderTypes.h:100-108).

    Populated from MTL files the same way ``Material.init(material:)``
    populates from MDLMaterial (reference: SubMesh.swift:37-54): Kd→base_color,
    Ks→specular, Ke→emission, Ns→specular_exponent, Ni→refraction_index,
    d→dissolve.
    """

    base_color: tuple = (0.0, 0.0, 0.0)
    specular: tuple = (0.0, 0.0, 0.0)
    emission: tuple = (0.0, 0.0, 0.0)
    specular_exponent: float = 0.0
    refraction_index: float = 0.0
    dissolve: float = 1.0
    name: str = ""
    # Base-color texture (extension; the reference parses texcoords and
    # ships texture assets but never shades them — SURVEY.md §2d): an
    # absolute image path from MTL ``map_Kd``, or a procedural spec like
    # ``"checker:8"`` (see assets.load_texture).  Empty = untextured.
    texture: str = ""


class MaterialTable(NamedTuple):
    """SoA material table indexed by per-triangle material id."""

    base_color: jnp.ndarray  # (M, 3) f32
    specular: jnp.ndarray  # (M, 3) f32
    emission: jnp.ndarray  # (M, 3) f32
    specular_exponent: jnp.ndarray  # (M,) f32
    refraction_index: jnp.ndarray  # (M,) f32
    dissolve: jnp.ndarray  # (M,) f32

    @property
    def count(self) -> int:
        return int(self.base_color.shape[0])


def pack_materials(materials: Sequence[Material]) -> MaterialTable:
    if not materials:
        materials = [Material(base_color=(1.0, 1.0, 1.0))]
    return MaterialTable(
        base_color=jnp.asarray([m.base_color for m in materials], jnp.float32),
        specular=jnp.asarray([m.specular for m in materials], jnp.float32),
        emission=jnp.asarray([m.emission for m in materials], jnp.float32),
        specular_exponent=jnp.asarray(
            [m.specular_exponent for m in materials], jnp.float32),
        refraction_index=jnp.asarray(
            [m.refraction_index for m in materials], jnp.float32),
        dissolve=jnp.asarray([m.dissolve for m in materials], jnp.float32),
    )


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render configuration — the jit-time equivalent of the
    reference's ``Uniforms`` + Metal function constants
    (reference: ShaderTypes.h:89-98; Renderer.swift:87-94).

    Frozen + hashable so it can be a static argument to ``jax.jit``, mirroring
    how ``resourcesStride``/``maxSubmeshes`` specialize the Metal pipeline at
    creation time.
    """

    width: int = 512
    height: int = 512
    spp: int = 1  # samples per pixel (reference renders 1/frame progressively)
    max_bounces: int = 3  # reference hardcodes 3 (Raytracing.metal:237)
    rand_offset_bits: int = 20  # arc4random() % 2^20 (Renderer.swift:263-270)
    seed: int = 0
    # Traversal backend: "auto" (pallas on TPU, bvh elsewhere) |
    # "bruteforce" | "bvh" | "pallas"
    tracer: str = "auto"
    # Triangles per BVH leaf cluster.  Pallas requires a multiple of 128
    # (aligned lane slices); 384 measured best on the dragon scene (bigger
    # leaves amortize the per-visit extract-min machinery).
    cluster_size: int = 384
    # Leaf clustering strategy: "sah" (binned surface-area heuristic at
    # cluster quantization) | "sah_free" (cluster-granular unquantized
    # splits, partially-full clusters) | "sah_chunk" (chunk-granular cost
    # model, pairs with the kernels' partial-cluster chunk skip) |
    # "median" | "morton" | "ploc" (bottom-up agglomerative, round 4 —
    # measured NEGATIVE: see accel.ploc_clusters).  sah_free measured
    # 190.7 vs sah's 200.5 ms/sample under the cluster1 key (dragon
    # 1024^2, batch13) — its pre-cluster1 edge at c512 moved to c384 once
    # the broad phase started charging per-cluster entry distance.
    bvh_builder: str = "sah_free"
    # sah_chunk per-visit machinery cost in 128-wide chunk-test units
    # (higher = fewer, fuller clusters).  NOTE: sah_chunk measured a clear
    # NEGATIVE on dragon 1024^2 (361 vs 277 ms/sample at ~1040 clusters,
    # bounce visits 12.26 -> 20.6): per-visit machinery ~0.7us dominates
    # the chunk-test savings, and the SA cost model undercounts correlated
    # sibling visits.  Kept as a knob for low-machinery future kernels.
    bvh_alpha: float = 2.0
    # Pass per-cluster counts to the kernels so partially-full clusters
    # skip all-padding trailing chunks (only active when the build marks
    # spec.partial_clusters).  Default OFF: on the one build class that
    # triggers it (sah_free c512, ~16% padding chunks) the per-chunk
    # conds measured 277.1 vs 271.7 ms/sample — the skipped dense work
    # is cheaper than the cond machinery.  The mechanism stays for
    # future builders with sparser clusters.
    chunk_skip: bool = False
    # Compute the global-set seed HOST-side (one fused XLA pass per ray
    # set) instead of in-kernel per tile: closest passes read a per-ray
    # packed seed key; shadow rays occluded by the global set fold into
    # the kernel mask BEFORE the shadow re-sort, compacting into dead
    # tiles the kernel skips.  pallas tracer only.
    host_seed: bool = True
    # Bake the shared camera origin into the primary pass's scene planes
    # (trace_pallas.bake_origin): the primary closest kernel then skips
    # every per-(ray, pair) origin term (~12 of ~45 dense vector ops, 6
    # slab subtractions) and DMAs 4 ray components instead of 7.  pallas
    # hierarchical kernel only (flat scenes ignore it).
    bake_primary: bool = False
    # Shadow sort key from the bounce's HIT cluster (free divide) instead
    # of the exact (N, NC) nearest-cluster broad phase; the segment fold
    # falls back to a super-level slab (conservative).  The shadow ray
    # starts ON the hit triangle, inside its cluster's box, so the exact
    # nearest slab-hit cluster is almost always that cluster anyway.
    shadow_hit_key: bool = False
    # Use the free hit-cluster shadow key only from this bounce on
    # (99 = never).  Late bounces have small shadow populations
    # (shadow_frac_by_bounce [0.47, 0.20, 0.11] on dragon) but their
    # exact (N, NC) key chain still runs full-width — a valid marginal
    # probe prices one chain at ~+11.6 ms/sample (batch r4-4) while the
    # whole bounce-2 shadow KERNEL costs only ~4 ms (device profile), so
    # trading key quality for the chain is favorable exactly where the
    # population is small.  Keys are ordering-only: image unchanged.
    # Negative values count from the end (-1 = the last bounce), so the
    # default generalizes across max_bounces.  Measured (batch r4-5,
    # dragon 1024² same-process): last-bounce proxy 176.9 vs exact 178.8
    # (-1.1%); proxying bounce 1 too was neutral vs this (177.1), and
    # the BOUNCE-key proxy lost (184.5) — adopted for the last bounce's
    # shadow key only.
    shadow_hit_key_from: int = -1
    # Same per-bounce trade for the BOUNCE compaction key: sorts at
    # bounce >= this use the previous-hit cluster id ("cluster1_hit"
    # proxy) instead of the exact broad phase (99 = never).  The full
    # replacement measured a loss in round 3; this restricts it to late
    # bounces where live_frac has collapsed.  Negative values count from
    # the end (-1 = the last bounce).
    bounce_hit_key_from: int = 99
    # Shadow-side second-nearest cluster id below the first in the shadow
    # sort key (the shadow mirror of the cluster2 bounce key); one extra
    # (N, NC) compare+min on keys the broad phase already forms.
    shadow_key2: bool = False
    # Visit TWO clusters per inner traversal iteration (closest + any
    # kernels).  Bit-identical results (the packed-key min is
    # order-independent; over-visiting wastes, never corrupts).
    # MEASURED NEGATIVE on dragon 1024^2: 201.4 vs 187.8 ms/sample
    # (batch22) with near-zero visit waste — suspected Mosaic register
    # pressure from two live (R, CHUNK) dense accumulators.  Kept as a
    # knob for smaller-cluster configs.
    visit_pairs: bool = False
    # Round-4 retry of the pair amortization with the register-pressure
    # hypothesis addressed: both clusters' dense chunks fold into ONE
    # shared (R, CHUNK) accumulator using (IDX_BITS + 1)-bit in-kernel
    # triangle indices (re-packed to the 9-bit key format after the
    # single lane reduce), so live loop state matches the one-visit walk
    # while per-visit extract-min machinery (argmin + score recompute +
    # lane reduce) halves.  t chops one bit coarser in-kernel (2^-13
    # relative; exact t is recomputed from the shade row regardless).
    # Hierarchical kernels, VMEM-resident scenes only.
    visit_pairs2: bool = False
    # SBVH-style spatial pre-split budget (extra references as a fraction
    # of the triangle count; 0 disables).  Splits huge triangles into
    # clipped references so cluster AABBs stay tight.  MEASURED NEGATIVE
    # on dragon 1024^2 (0.3: 334 -> 518 ms/sample; bounce visits mean
    # 10.1 -> 14.3 — shallow bounce rays leaving the ground plane cross
    # MANY thin plane-piece clusters that the single scene-spanning
    # cluster previously answered in one visit).  Kept as a knob for
    # scenes dominated by mid-sized straddling triangles; the dragon-class
    # fix is the global-triangle set (see accel/global set) instead.
    bvh_presplit: float = 0.0
    ray_block: int = 128  # rays per traversal block (bounce passes)
    # Traversal block for the PRIMARY pass pair (camera rays + bounce-0
    # shadows).  Primary blocks are near-perfectly coherent (visits p90 ~4),
    # so their cost is dominated by the fixed per-block kernel machinery —
    # larger blocks amortize it without multiplying visits the way they do
    # for incoherent bounce rays (where ray_block=256 measured worse).
    # Measured: 512 saves ~25 ms/sample on dragon 1024^2 (vs 128; 256
    # saves ~13).  None = use ray_block.
    primary_ray_block: Optional[int] = 512
    # Traversal block for the RE-SORTED bounce shadow passes.  After the
    # (light, Morton) re-sort ~75-82% of shadow blocks resolve with ZERO
    # cluster visits (global-seed occlusion or slab miss) — purely
    # fixed-cost-bound, so bigger blocks amortize machinery the way
    # primaries do.  512 measured 253.4 vs 262.3 ms/sample on dragon
    # 1024^2 (256 was neutral-negative).  None = ray_block.
    shadow_ray_block: Optional[int] = 512
    # Override for the LAST bounce's shadow pass only (0 = use
    # shadow_ray_block).  The bounce-2 shadow pass is the exhaustion tail
    # (visits mean 14.57 at block 512 — unoccluded rays must visit every
    # candidate): a 512-ray block's visit set is the UNION over 512
    # divergent segments, so a smaller block may cut live-tile dense work
    # there even though it pays more fixed cost on the (many) zero-visit
    # tiles.
    shadow_ray_block_last: int = 0
    # Wavefront compaction: permute rays so live rays pack into full
    # traversal blocks between bounces (the realized version of the
    # reference's dead bitonic-sort divergence experiment,
    # Raytracing.metal:179-197, README.md:9).
    compaction: bool = True
    # Additionally sort live bounce rays by origin-Morton + direction
    # octant so traversal blocks stay spatially coherent after the first
    # bounce (costs one argsort per bounce; identical image).
    sort_bounces: bool = True
    # Compaction-sort the PRIMARY (bounce-0) rays too.  Pixel-tile order
    # is already spatially coherent, but the cluster sort key buys two
    # things tile order cannot: (a) blocks share their first traversal
    # visit exactly instead of approximately, shrinking the per-block
    # UNION visit set the (large) primary blocks pay for, and (b) the
    # known-miss fold compacts rays whose broad phase proves they can
    # only hit the scene-spanning global set (the FLOOR — the majority
    # surface on the headline scene; primary visits p50 = 0) into fully
    # dead blocks the kernel skips at ~zero cost, instead of carrying
    # them as zero-visit lanes inside live blocks.  Costs one extra
    # 15-operand compaction sort + key pass at bounce 0.
    sort_primary: bool = False
    # Skip the compaction sort before the FINAL bounce: its rays inherit
    # the previous bounce's (still mostly coherent) order, trading some
    # traversal coherence for one fewer 15-operand 1M-row sort (~18 ms)
    # + key compute.  Identical image (the sort is a pure permutation);
    # knob exists for A/B (skipping measured a clear LOSS: sortlast0
    # 308.1 vs 260.6, BASELINE.md batch12 — default stays True).
    sort_last_bounce: bool = True
    # Carry path throughput + per-ray radiance through the bounce
    # compaction sort as three packed f16-PAIR words instead of six f32
    # operands (15 -> 12 sort operands; the 1M-row multi-operand sort's
    # cost is ~linear in operand count).  Rounds those six values to f16
    # (2^-11 relative) once per bounce sort — well inside the 1e-3 pixel
    # budget, but not bit-exact, and radiance above f16 max (65504)
    # would saturate.  Geometry (o, d) and indices stay f32/i32 exact.
    sort_pack_f16: bool = False
    # Bounce sort-key layout: "dir6"/"dir9" (direction quantized to 2/3
    # bits per axis, then origin Morton — dir6 measured 11% over the
    # octant key) | "dir_major" (octant then origin Morton) | "hybrid"
    # (coarse origin cell, then octant, then fine Morton) | "cluster1"
    # (pallas only: NEAREST slab-hit cluster id from a fused host-side
    # broad phase, then dir6 cone, then Morton — blocks share their first
    # traversal visit by construction; falls back to dir_major when the
    # padded cluster count exceeds the key's 12 id bits or the tracer has
    # no packed cluster planes) | "cluster1_dir9" (same, with 512 secondary
    # direction cones instead of 64) | "cluster2" (second-nearest cluster id
    # below the first: rays sharing their first TWO visits pack together) |
    # "cluster1_hit" (previous-hit cluster id as the free grouping proxy +
    # super-level broad phase/fold — ~15x cheaper key computation, but
    # MEASURED WORSE: 216.5 vs 190.9, bounce visits -> 10.96; the exact
    # broad phase earns its cost) | "cluster2_nodir"/"cluster3" (low-bit
    # ablations under cid1|cid2).
    # cluster1 measured 196.8 vs dir6's 260.6 ms/sample on dragon 1024^2
    # (sweep_r3 batch12); cluster2 (the default) measured 184.4 vs
    # cluster1's 192.0 same-process (batch17) with bounce visits mean
    # 8.25 -> 5.65, p50 5 -> 2 — rays sharing their first TWO traversal
    # visits pack together.
    sort_key: str = "cluster2"
    # Fused Pallas broad phase (pallas tracer only): compute the
    # (N, NC) nearest-cluster slab key(s) AND the global-set seed /
    # occlusion in ONE kernel pass per ray set, replacing the 2-3
    # separate XLA passes per bounce (~19.7 + 15.9 ms each per 1M rays,
    # ~4x off the VPU ALU floor the kernel approaches).  Used for the
    # bounce sort key + miss fold, the shadow sort key + global
    # occlusion, and (with_clusters=False) the primary seed.  The
    # global-seed t comes from a Newton-refined reciprocal instead of
    # an exact divide — within 2^-16, inside every consumer's 2^-14
    # chop margin; winner indices match the XLA form.
    # MEASURED NEGATIVE on dragon 1024^2 (sweep_r4a/b): pipeline 213 vs
    # 192 ms/sample, and standalone the kernel LOSES to the XLA passes
    # it replaces (global-only 19.1 vs 9.9 ms; closest2+global 20.6 vs
    # 24.3 at best) — per-tile kernel machinery (transposes, masking,
    # output staging) exceeds the XLA forms' cost, which fuse into
    # neighboring elementwise work nearly for free in-pipeline.  Kept as
    # a knob; round-3's standalone XLA pass costs (19.7/15.9 ms) were
    # measurement artifacts of their jit boundaries.
    fused_broadphase: bool = False
    # Ray block for the fused broad-phase kernel (no divergence — all
    # rays do identical dense work, so bigger blocks amortize fixed
    # per-tile cost; VMEM intermediates scale with block * clusters).
    broadphase_block: int = 256
    # Rank-directed cluster-major closest traversal for the sorted BOUNCE
    # passes (round-5 restructure, VERDICT r4 #1).  0 = off (hierarchical
    # extract-min kernel).  K >= 2: the exact broad phase that already
    # feeds the cluster2 sort key emits each ray's K nearest candidate
    # clusters as packed (entry-t | id) keys PLUS a rank-(K+1) resolution
    # key; the keys ride the compaction sort, and a slab-free kernel walks
    # each tile's per-lane candidate lists directly (no supers, no
    # in-kernel slab, no score extract-min) — near-to-far via one packed
    # min over the pending rows.  Rays whose best hit cannot be certified
    # against the rank-(K+1) entry (t_best + chop > entry_{K+1}) fall back
    # to the hierarchical kernel seeded with their rank-walk best, at
    # collapsed population.  Requires sort_key cluster1/cluster2 + pallas
    # hierarchical tracer; silently off otherwise.
    rank_trace: int = 0
    # Fuse the bounce-b SHADOW broad phase with the bounce-(b+1) BOUNCE
    # broad phase in one variadic (N, NC) sweep (ops.trace_pallas.
    # nearest_cluster_pair): both chains run over IDENTICAL origins (the
    # offset hit point), so the six per-axis (box - o) subtrahends are
    # computed once.  Bit-identical keys; the next bounce's keys ride the
    # compaction sort as extra operands instead of being recomputed.
    # Applies at bounces whose shadow key uses the exact broad phase and
    # whose successor sort does too; off under refraction (shadow and
    # bounce origins diverge there).  ADOPTED round 5: three same-process
    # dragon 1024^2 A/Bs won -1.3/-2.4/-2.0% (173.6 vs 175.8, 172.3 vs
    # 176.5, 173.0 vs 176.6 ms/sample, sweep_r5 batches 1-3).  Composing
    # it with rank_trace needs the ranks=3 FOUR-operand variadic reduce,
    # which lowers to a slow path (+13 ms vs rank2 alone, both batches)
    # — pair+rank2 is reproducibly the worst of the three combinations.
    pair_broadphase: bool = True
    # Live-prefix bucket count for the post-sort bounce stages.  After a
    # bounce compaction sort the live rays are a contiguous prefix of
    # known (traced) length; the renderer dispatches the whole bounce
    # tail (closest kernel, shade-row gather, Halton dims, light
    # sampling, the shadow re-sort pair, bounce continuation) through a
    # lax.switch over ~live_widths static prefix widths, so per-lane
    # work scales with OCCUPANCY instead of the padded ray count —
    # the analog of the early `break` the reference's megakernel gets
    # per thread for free (reference: Raytracing.metal:246-247).
    # Identical image to float rounding: suffix lanes are all dead and
    # pass through untouched; the only deltas are ~1-ulp FMA/fusion
    # differences from per-width XLA codegen (measured ~4e-8 max abs,
    # far inside every parity gate).  <= 1 disables.  Compile cost
    # scales with the bucket count (each bucket compiles the tail once).
    # MEASURED NEGATIVE on dragon 1024^2 (sweep_r4a/b): +16-21 ms even
    # when restricted to bounce 2 (lw4_fromb2 200.0 vs anchor 186.3) —
    # each lax.switch is a fusion/scheduling barrier costing ~7 ms,
    # more than the dead-lane work it skips (the round-3 "conds cost
    # more than dense work" lesson at pipeline scale).  Off by default;
    # revisit only for scenes with far lower bounce occupancy.
    live_widths: int = 1
    # First bounce the live-prefix dispatch applies to (earlier bounces
    # run the plain full-width tail).  Scenes whose primary rays all hit
    # geometry (dragon/coatball: live_b1 = 1.0) pay switch overhead at
    # bounce 1 for no dead lanes; 2 skips them.
    live_from_bounce: int = 1
    # Carry the per-ray global-seed key through the bounce compaction
    # sort as one extra operand instead of recomputing the full-width
    # global-set pass on the sorted rays (the key is permutation-
    # invariant, so this is bit-identical).  On paper saves one global
    # pass per sorted bounce for ~1 sort operand — MEASURED NEGATIVE on
    # dragon 1024^2 (196.0/194.1 vs 192.0/186.3 anchors, sweep_r4a/b):
    # the recomputed global pass fuses into its consumers nearly for
    # free, while the extra 1M-row sort operand is a real cost.  Off by
    # default; knob kept for documentation.
    carry_seed: bool = False
    # With sort_key="cluster1": rays whose broad phase finds NO cluster
    # overlap (sky rays, or rays that can only hit the scene-spanning
    # global set) are masked out of the closest-hit kernel — the cluster1
    # key packs them into fully-dead tiles the kernel skips, and their
    # global-set hits are resolved host-side from the same fused pass the
    # host seed uses.  Identity transform; knob exists for A/B.
    cluster_miss_fold: bool = True
    # Visit shadow candidates nearest the SEGMENT MIDDLE first instead
    # of nearest the origin (any-hit is order-independent, so the image
    # is bit-identical).  Real occluders sit between the surface and the
    # light; entry order wastes early visits on boxes hugging the
    # origin.  Aims at the bounce-2 shadow exhaustion tail
    # (shadow_visits_mean_by_bounce[2] = 14.57; VERDICT round 3 #4).
    shadow_mid_order: bool = False
    # Re-sort bounce-shadow rays by (light index, hit-point Morton) before
    # the occlusion pass: a shadow ray's direction is determined by its
    # origin (it points at the sampled light), so one origin key buys both
    # origin AND direction coherence — the bounce sort's order is tuned
    # for the bounce direction, not the shadow segment.  Costs one 9-operand
    # sort + one 2-operand unsort per bounce >= 1; identical image.
    # Measured 550 -> 402 ms/sample on dragon 1024.
    shadow_sort: bool = True
    # Also re-sort the PRIMARY shadow pass (bounce 0): origins are already
    # tile-coherent there, but the random light pick scatters directions
    # between lights within a tile.
    shadow_sort_primary: bool = False
    # Shade extensions beyond the reference's diffuse-only shading
    enable_specular: bool = False
    enable_emission: bool = False
    # Dielectric refraction (the reference's declared next feature,
    # README.md:8): materials with dissolve < 1 and Ni > 0 transmit a
    # (1 - dissolve) fraction via Snell/Fresnel sampling.
    enable_refraction: bool = False
    # Base-color textures (UV-mapped map_Kd modulation; the reference
    # parses texcoords but never shades them — deliberate extension)
    enable_textures: bool = False
    # Texture minification/magnification filter: "nearest" (one gather per
    # hit) or "bilinear" (four gathers + lerp; the reference ships a
    # mipmapped ColorMap asset it never samples — SURVEY.md §2d)
    texture_filter: str = "nearest"
    env_map: bool = False
    # Samples rendered per jitted dispatch (a lax.fori_loop over the
    # sample index with the progressive-accumulation fold inline).  Small
    # scenes are DISPATCH-bound (~1.5-2.5 ms tunnel latency per jitted
    # call, BASELINE.md) the way the reference pays one dispatch per
    # vsync frame (reference: Renderer.swift:284); batching k samples
    # amortizes it.  0 = auto (4 for images <= 512x512, else 1).
    # Identical image: the in-loop fold is the same sequential
    # ``accumulate`` the per-step path applies.
    samples_per_dispatch: int = 0
    # Traversal telemetry: adds per-bounce clusters-visited arrays to the
    # render stats (pallas tracer only; compiles a separate instrumented
    # kernel — leave off on the hot path).
    telemetry: bool = False
    # Ray-sample export stride (observability only; 0 = off).  When > 0,
    # every stride-th BOUNCE ray (rays_b{1..}) and SHADOW segment
    # (srays_b{0..}) is returned in the render stats as an (M, 8) row
    # table [ox oy oz dx dy dz max_t live] — the measured ray
    # distribution that feeds the ray-weighted cluster builder
    # (accel.sah_free_clusters(rays=...), RenderConfig.bvh_builder
    # "sah_rays"; benchmarks/feedback_recluster.py).
    export_rays: int = 0

    @property
    def num_pixels(self) -> int:
        return self.width * self.height
