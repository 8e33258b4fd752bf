"""Wavefront path-tracing pipeline + progressive renderer.

TPU-native rewrite of the reference's per-pixel megakernel
(reference: MetalRaytracing/Raytracing.metal:156-405) and its host-side frame
orchestration (reference: Renderer.swift:284-351).  The per-thread bounce loop
with divergent branches becomes a batched wavefront: for each bounce, ALL rays
are traced, shaded with branchless masked math, shadow-tested, and re-emitted —
one ``jit``-compiled step per sample with no host round trips inside.

Semantics preserved exactly (pixel-parity goals, SURVEY.md §4):
- Halton dimension schedule ``d = 0,1`` pixel jitter, ``2 + 5*bounce + k``
  for light-select / light-uv / bounce-uv (Raytracing.metal:202-203, 272,
  284-285, 384-385) with per-pixel random index offsets
  (Renderer.swift:249-274).
- Camera ray generation from image-plane-scaled basis (Raytracing.metal:206-218).
- One uniformly chosen light per bounce, lightCount compensation, N.L
  saturate, 1e-4 shadow-ray culling threshold, 1e-3 origin offsets and
  shadow-distance backoff (Raytracing.metal:272-374).
- Throughput ``color *= baseColor`` before the light contribution is added
  (Raytracing.metal:339, 372).
- Progressive average ``(prev*frame + sample)/(frame+1)``
  (Raytracing.metal:395-401) with donated accumulation buffers — the JAX
  equivalent of the reference's ping-pong textures (Renderer.swift:332-334).

Extensions beyond the reference (gated off by default for parity): HDR
environment lighting on miss, emissive materials, specular reflection,
and dielectric refraction (the reference lists refraction/specular as
TODO, reference README.md:8 — both are implemented here behind config
gates).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import sampling
from .lights import sample_lights, select_light
from .ops import trace as trace_ops
from .ops.intersect import BIG_T
from .scene import Scene, SceneData, SceneSpec
from .types import RenderConfig

__all__ = ["render_sample", "render_rays", "pixel_coords", "accumulate",
           "Renderer", "make_pixel_offsets"]

# Marginal-cost probes (benchmarks monkeypatch this, like
# trace_pallas.ABLATE).  Each entry ADDS one redundant copy of a pipeline
# component and folds its result into the image at 1e-30 weight, so the
# variant's delta vs the same-process anchor prices that component's TRUE
# in-pipeline marginal cost — standalone jit measurements overstate
# components that fuse into neighbors (round-4 fused_broadphase lesson),
# and REMOVING a component changes ray distributions and thus traversal
# cost.  Entries: "shade_extra" (one more 20-wide shade-row gather per
# bounce), "halton_extra" (5 more Halton dims per bounce), "bp_extra"
# (one more exact (N, NC) nearest-cluster pass per bounce), "sort_extra"
# (one more 15-operand compaction sort per bounce), "shade_stub"
# (REPLACE the real shade gather with a constant row — wrong image,
# removal-side price of the gather).
ABLATE_EXTRA: frozenset = frozenset()


def make_pixel_offsets(cfg: RenderConfig) -> jnp.ndarray:
    """Per-pixel Halton index offsets, (H*W,) int32 in [0, 2^bits) — the
    reference's r32Uint random texture (reference: Renderer.swift:249-274)."""
    key = jax.random.PRNGKey(cfg.seed)
    return sampling.pixel_decorrelation_offsets(
        key, (cfg.height * cfg.width,), bits=cfg.rand_offset_bits)


def _env_lookup(env: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Nearest-sample a lat-long environment map with unit directions."""
    he, we = env.shape[0], env.shape[1]
    u = jnp.arctan2(d[..., 0], -d[..., 2]) / (2.0 * jnp.pi) + 0.5
    v = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) / jnp.pi
    xi = jnp.clip((u * we).astype(jnp.int32), 0, we - 1)
    yi = jnp.clip((v * he).astype(jnp.int32), 0, he - 1)
    return env[yi, xi]


def _normalize(v, eps=1e-20):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def _expand_bits_9(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 9 bits so they occupy every 3rd bit (Morton)."""
    v = v & 0x1FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _pack2f16(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Round two f32 arrays to f16 and pack the bit patterns into one
    int32 word (``a`` high, ``b`` low) — a sort-payload compressor
    (RenderConfig.sort_pack_f16)."""
    ua = jax.lax.bitcast_convert_type(a.astype(jnp.float16), jnp.uint16)
    ub = jax.lax.bitcast_convert_type(b.astype(jnp.float16), jnp.uint16)
    return jax.lax.bitcast_convert_type(
        (ua.astype(jnp.uint32) << 16) | ub.astype(jnp.uint32), jnp.int32)


def _unpack2f16(w: jnp.ndarray) -> tuple:
    """Inverse of :func:`_pack2f16` (exact on the stored f16 values)."""
    u = jax.lax.bitcast_convert_type(w, jnp.uint32)
    a = jax.lax.bitcast_convert_type(
        (u >> 16).astype(jnp.uint16), jnp.float16)
    b = jax.lax.bitcast_convert_type(
        (u & 0xFFFF).astype(jnp.uint16), jnp.float16)
    return a.astype(jnp.float32), b.astype(jnp.float32)


def _morton_512(points: jnp.ndarray, data: SceneData) -> jnp.ndarray:
    """27-bit Morton codes of points on a 512^3 grid over the root AABB —
    the shared origin half of both the bounce and shadow sort keys."""
    root_lo = data.node_lo[0]
    root_ext = jnp.maximum(data.node_hi[0] - root_lo, 1e-12)
    q = jnp.clip(((points - root_lo) / root_ext) * 512.0,
                 0.0, 511.0).astype(jnp.int32)
    return (_expand_bits_9(q[:, 0]) << 2 | _expand_bits_9(q[:, 1]) << 1
            | _expand_bits_9(q[:, 2]))


def _bucket_widths(p: int, pad_to: int, k: int) -> list:
    """Static prefix-width buckets for the live-prefix tail dispatch:
    ~k evenly spaced widths, each a multiple of every traversal block
    size (``pad_to``), the last exactly ``p``.  k <= 1 disables
    bucketing (a single full-width bucket)."""
    if k <= 1 or p <= pad_to:
        return [p]
    ws = []
    for j in range(1, k + 1):
        w = min(p, -(-p * j // k // pad_to) * pad_to)
        if w >= pad_to and w not in ws:
            ws.append(w)
    if not ws or ws[-1] != p:
        ws.append(p)
    return ws


def _make_tracers(data: SceneData, spec: SceneSpec, cfg: RenderConfig):
    """Tracer pair with a uniform call surface.

    Both return callables taking ``(o, d, [max_t,] mask)`` plus a
    pallas-only perf kwarg the exact tracers ignore: ``block`` (per-pass
    traversal block size override — primaries use the larger
    cfg.primary_ray_block; fully masked tiles are skipped inside the
    kernel from the mask itself)."""
    tracer = cfg.tracer
    if tracer == "auto":
        tracer = "pallas" if jax.default_backend() == "tpu" else "bvh"
    cfg = dataclasses.replace(cfg, tracer=tracer)
    if cfg.tracer == "bruteforce":
        closest_p = functools.partial(
            trace_ops.trace_closest_bruteforce, geometry=data.geometry)
        any_p = functools.partial(
            trace_ops.trace_any_bruteforce, geometry=data.geometry)

        def closest(o, d, m, block=None, seed=None, baked=False):
            return closest_p(o, d, m)

        def any_hit(o, d, mt, m, block=None):
            return any_p(o, d, mt, m)
    elif cfg.tracer == "bvh":
        closest_p = functools.partial(
            trace_ops.trace_closest, geometry=data.geometry,
            node_lo=data.node_lo, node_hi=data.node_hi, spec=spec.bvh,
            block=cfg.ray_block)
        any_p = functools.partial(
            trace_ops.trace_any, geometry=data.geometry,
            node_lo=data.node_lo, node_hi=data.node_hi, spec=spec.bvh,
            block=cfg.ray_block)

        def closest(o, d, m, block=None, seed=None, baked=False):
            return closest_p(o, d, m)

        def any_hit(o, d, mt, m, block=None):
            return any_p(o, d, mt, m)
    elif cfg.tracer == "pallas":
        from .ops import trace_pallas

        host_seed = cfg.host_seed and spec.bvh.num_global > 0
        closest_p = functools.partial(
            trace_pallas.trace_closest, sup=data.sup_planes,
            clu=data.clu_planes, tri=data.tri_planes, spec=spec.bvh,
            count_visits=cfg.telemetry,
            counts=data.clu_counts if cfg.chunk_skip else None,
            pair_visits=(cfg.visit_pairs
                         and not trace_pallas._use_flat(spec.bvh, None)),
            pair_shared=(cfg.visit_pairs2
                         and not trace_pallas._use_flat(spec.bvh, None)),
            # the renderer recomputes exact t from the shade-row gather it
            # pays anyway — skip the tracer's own plane gather
            exact_uv=False)
        any_p = functools.partial(
            trace_pallas.trace_any, sup=data.sup_planes,
            clu=data.clu_planes, tri=data.tri_planes, spec=spec.bvh,
            count_visits=cfg.telemetry,
            counts=data.clu_counts if cfg.chunk_skip else None,
            mid_order=cfg.shadow_mid_order,
            pair_visits=(cfg.visit_pairs
                         and not trace_pallas._use_flat(spec.bvh, None)),
            pair_shared=(cfg.visit_pairs2
                         and not trace_pallas._use_flat(spec.bvh, None)),
            # with the host-side fold the kernels never test the
            # global set (render_rays masks occluded rays instead)
            seed_global=not host_seed)

        use_baked = (cfg.bake_primary
                     and not trace_pallas._use_flat(spec.bvh, None))
        if use_baked:
            # shared-camera-origin planes for the primary pass (see
            # RenderConfig.bake_primary); traced inside the render jit —
            # three ray-independent elementwise passes XLA hoists
            baked_tabs = trace_pallas.bake_origin(
                data.sup_planes, data.clu_planes, data.tri_planes,
                data.camera.position)

        def closest(o, d, m, block=None, seed=None, baked=False):
            if seed is None and host_seed:
                if cfg.fused_broadphase:
                    # global-only variant of the fused broad-phase
                    # kernel (~4x the XLA pass's throughput)
                    seed = trace_pallas.broadphase_keys(
                        o, d, m, data.clu_planes, data.tri_planes,
                        spec.bvh, with_clusters=False,
                        block=cfg.broadphase_block)[2]
                else:
                    seed = trace_pallas.global_seed_keys(
                        o, d, m, data.tri_planes, spec.bvh)
            if baked and use_baked:
                return closest_p(o, d, m, block=block or cfg.ray_block,
                                 seed_key=seed, baked_origin=True,
                                 sup=baked_tabs[0], clu=baked_tabs[1],
                                 tri=baked_tabs[2])
            return closest_p(o, d, m, block=block or cfg.ray_block,
                             seed_key=seed)

        def any_hit(o, d, mt, m, block=None):
            return any_p(o, d, mt, m, block=block or cfg.ray_block)

        if (cfg.rank_trace and not trace_pallas._use_flat(spec.bvh, None)
                # scenes with a global set need the host seed on the rank
                # walk's rays — produced by the miss-fold's global pass
                and (spec.bvh.num_global == 0
                     or (host_seed and cfg.cluster_miss_fold))):
            assert cfg.rank_trace == 2, (
                "rank_trace supports K=2 (single-pass rank-3 broad phase)")

            def closest_rank(o, d, m, rank_keys, seed):
                """Rank-directed closest walk + certificate + seeded
                hierarchical fallback (RenderConfig.rank_trace).

                ``rank_keys``: K+1 packed (entry-t | id) keys, ranks
                1..K+1, in this call's ray order; ``seed``: packed host
                global-seed keys (None only when the scene has no global
                set).  Returns (Hit, visits-or-None, unresolved-count).
                """
                K = len(rank_keys) - 1
                res = trace_pallas.trace_closest_rank(
                    o, d, m, list(rank_keys[:K]), data.tri_planes,
                    spec.bvh, seed_key=seed, block=cfg.ray_block,
                    counts=data.clu_counts if cfg.chunk_skip else None,
                    count_visits=cfg.telemetry)
                key, base = res[0], res[1]
                vis = res[2] if cfg.telemetry else None
                cert = trace_pallas.rank_certificate(key, rank_keys[K])
                unresolved = m & ~cert
                # fallback: the full hierarchical walk, seeded per-lane
                # with the rank walk's best so its culling starts tight.
                # The stragglers are SCATTERED in cluster-key order
                # (certification failure tracks geometric ambiguity, not
                # the sort key), so a full-width fallback re-activates
                # nearly every tile for its ~4-5% unresolved lanes — the
                # in-kernel any_live skip only saves FULLY dead tiles.
                # One multi-operand sort compacts them into the first
                # ~n_unresolved/block tiles (sorts are cheap: x_sort
                # marginal +0.8 ms), the suffix tiles die, and a second
                # sort restores ray order (18x cheaper than a scatter).
                idx = jnp.arange(o.shape[0], dtype=jnp.int32)
                # 0/1 key with idx as an explicit SECOND sort key: the
                # unresolved prefix keeps the incoming bounce order
                # (cluster2 key = origin-Morton + direction coherent).
                # Grouping the prefix by rank-1 cluster id instead
                # measured WORSE (183.8 vs 176.6 anchor, batch r5-3):
                # certification failure means the true winner lies
                # BEYOND rank 2, so cid1 grouping scatters origins and
                # the fallback blocks pay a wider union than the bounce
                # order they came in with.
                cert_last = jnp.where(unresolved, jnp.int32(0),
                                      jnp.int32(1))
                s = jax.lax.sort(
                    (cert_last, idx, o[:, 0], o[:, 1], o[:, 2],
                     d[:, 0], d[:, 1], d[:, 2], key, base),
                    dimension=0, is_stable=False, num_keys=2)
                o_s = jnp.stack(s[2:5], axis=-1)
                d_s = jnp.stack(s[5:8], axis=-1)
                fb = closest_p(
                    o_s, d_s, s[0] == 0,
                    block=cfg.ray_block, seed_key=s[8], seed_base=s[9])
                if cfg.telemetry:
                    # per-BLOCK visit counts: block identities differ
                    # between the two orders but every aggregate the
                    # telemetry derives is permutation-invariant
                    fb, fb_vis = fb
                    vis = vis + fb_vis
                u = jax.lax.sort((s[1], fb.t, fb.tri), dimension=0,
                                 is_stable=False, num_keys=1)
                fb_t, fb_tri = u[1], u[2]
                found_r = key < jnp.int32(trace_pallas._MISS_KEY)
                t_r = trace_pallas._key_to_t(key)
                tri_r = jnp.where(
                    found_r, base + (key & trace_pallas.IDX_MASK), -1)
                t = jnp.where(unresolved, fb_t, t_r)
                tri = jnp.where(unresolved, fb_tri, tri_r)
                z = jnp.zeros_like(t)
                hit = trace_ops.Hit(t=t, u=z, v=z, tri=tri)
                return hit, vis, jnp.sum(unresolved.astype(jnp.int32))
        else:
            closest_rank = None
        return closest, any_hit, closest_rank, cfg.tracer
    else:
        raise ValueError(f"unknown tracer {cfg.tracer!r}")
    return closest, any_hit, None, cfg.tracer


def pixel_coords(cfg: RenderConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flat (H*W,) pixel x/y coordinate arrays in row-major order."""
    xs = jnp.arange(cfg.width, dtype=jnp.float32)
    ys = jnp.arange(cfg.height, dtype=jnp.float32)
    return jnp.tile(xs, cfg.height), jnp.repeat(ys, cfg.width)


# Tile shapes per ray-block size: each traversal block of rays covers a
# compact image tile instead of a thin row strip, so the rays share BVH
# nodes — the analog of the reference's 8x8 threadgroup dispatch
# (reference: Renderer.swift:295-300; Raytracing.metal:156).
_TILE_SHAPES = {64: (8, 8), 128: (8, 16), 256: (16, 16), 512: (16, 32),
                1024: (32, 32)}


def tile_shape(cfg: RenderConfig) -> Optional[Tuple[int, int]]:
    """(tile_h, tile_w) when the image divides evenly, else None.

    Tiles are sized to the PRIMARY traversal block: only the primary pass
    pair consumes the pixel order directly (bounce passes re-sort)."""
    th_tw = _TILE_SHAPES.get(cfg.primary_ray_block or cfg.ray_block)
    if th_tw is None:
        return None
    th, tw = th_tw
    if cfg.height % th or cfg.width % tw:
        return None
    return th, tw


def _tile_flatten(img2d: jnp.ndarray, th: int, tw: int) -> jnp.ndarray:
    """(H, W, ...) -> flat (H*W, ...) in tile-major order."""
    h, w = img2d.shape[0], img2d.shape[1]
    rest = img2d.shape[2:]
    t = img2d.reshape((h // th, th, w // tw, tw) + rest)
    t = jnp.moveaxis(t, 2, 1)  # (H/th, W/tw, th, tw, ...)
    return t.reshape((h * w,) + rest)


def _tile_unflatten(flat: jnp.ndarray, h: int, w: int, th: int,
                    tw: int) -> jnp.ndarray:
    """Inverse of :func:`_tile_flatten`."""
    rest = flat.shape[1:]
    t = flat.reshape((h // th, w // tw, th, tw) + rest)
    t = jnp.moveaxis(t, 1, 2)  # (H/th, th, W/tw, tw, ...)
    return t.reshape((h, w) + rest)


def render_rays(
    data: SceneData,
    spec: SceneSpec,
    cfg: RenderConfig,
    px: jnp.ndarray,  # (N,) f32 pixel x coordinates
    py: jnp.ndarray,  # (N,) f32 pixel y coordinates
    offsets: jnp.ndarray,  # (N,) i32 per-pixel Halton offsets
    frame_index: jnp.ndarray,  # () i32 sample index
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Path-trace one sample for an arbitrary flat set of pixels.

    Returns ((N, 3) radiance, stats).  This is the shardable core: multi-chip
    tile sharding feeds each device a disjoint slice of pixels (SURVEY.md
    §2e).  ``stats`` counts traced rays for the Mrays/s metric:
    ``closest_rays`` and ``shadow_rays`` (the two intersector call sites of
    the reference, Raytracing.metal:244 and :367).
    """
    w, h = cfg.width, cfg.height
    n = px.shape[0]
    block = cfg.ray_block
    pblock = cfg.primary_ray_block or block
    sblock = cfg.shadow_ray_block or block
    sblock_last = cfg.shadow_ray_block_last or sblock
    # rays padded to a common multiple of ALL block sizes
    import math

    pad_to = block * pblock // math.gcd(block, pblock)
    pad_to = pad_to * sblock // math.gcd(pad_to, sblock)
    pad_to = pad_to * sblock_last // math.gcd(pad_to, sblock_last)
    if cfg.fused_broadphase:
        # the fused broad-phase kernel asserts its own block divisibility
        bb = cfg.broadphase_block
        pad_to = pad_to * bb // math.gcd(pad_to, bb)
    p = -(-n // pad_to) * pad_to
    lcount = spec.light_count

    pad = p - n
    px = jnp.pad(px, (0, pad))
    py = jnp.pad(py, (0, pad))
    mask = jnp.pad(jnp.ones((n,), bool), (0, pad))
    idx = jnp.pad(offsets.astype(jnp.int32), (0, pad)) + frame_index

    # Camera ray generation (reference: Raytracing.metal:201-218).
    jitter_x = sampling.halton(idx, sampling.DIM_PIXEL_X)
    jitter_y = sampling.halton(idx, sampling.DIM_PIXEL_Y)
    uv_x = (px + jitter_x) / w * 2.0 - 1.0
    uv_y = (py + jitter_y) / h * 2.0 - 1.0
    cam = data.camera
    d = _normalize(uv_x[:, None] * cam.right[None]
                   + uv_y[:, None] * cam.up[None]
                   + cam.forward[None])
    o = jnp.broadcast_to(cam.position[None], (p, 3))

    closest_fn, any_fn, closest_rank_fn, tracer_kind = _make_tracers(
        data, spec, cfg)
    geom = data.geometry
    mats = data.materials

    color = jnp.ones((p, 3))  # path throughput (Raytracing.metal:226)
    accum = jnp.zeros((p, 3))
    alive = mask
    tele_stats: Dict[str, jnp.ndarray] = {}  # per-bounce visit telemetry
    # ``cur`` maps the current (possibly compacted) ray order back to the
    # original pixel slot; the radiance scatters through it at the end.
    cur = jnp.arange(p, dtype=jnp.int32)
    closest_count = jnp.int32(0)
    shadow_count = jnp.int32(0)
    # previous bounce's hit triangle (for the dir6_cluster sort key)
    prev_tri = jnp.full((p,), -1, jnp.int32)

    def _pair_at(bounce):
        """Static: does bounce_tail(bounce) fuse its shadow broad phase
        with bounce (bounce+1)'s sort-key broad phase into ONE
        nearest_cluster_pair sweep (cfg.pair_broadphase)?  True only when
        this bounce's shadow key uses the exact (N, NC) chain AND the
        next bounce's sort does too, over shared origins (refraction
        moves the bounce origin off the shadow origin, so it disables
        the fusion)."""
        if not (cfg.pair_broadphase and tracer_kind == "pallas"
                and data.clu_planes is not None):
            return False
        nc_tot_p = data.clu_planes.shape[0] * data.clu_planes.shape[1]
        if (nc_tot_p > 4095 or cfg.enable_refraction
                or cfg.fused_broadphase or cfg.shadow_key2
                or cfg.sort_key != "cluster2"):
            return False
        # this bounce's shadow key must be the exact broad phase
        shf_p = (cfg.shadow_hit_key_from if cfg.shadow_hit_key_from >= 0
                 else cfg.max_bounces + cfg.shadow_hit_key_from)
        if cfg.shadow_hit_key or bounce >= shf_p:
            return False
        if not (cfg.shadow_sort and cfg.compaction
                and (bounce > 0 or cfg.shadow_sort_primary)):
            return False
        # ... and the NEXT bounce must compaction-sort with the exact key
        if bounce + 1 >= cfg.max_bounces:
            return False
        if not (cfg.compaction and cfg.sort_bounces
                and (cfg.sort_last_bounce
                     or bounce + 1 < cfg.max_bounces - 1)):
            return False
        bhf_p = (cfg.bounce_hit_key_from if cfg.bounce_hit_key_from >= 0
                 else cfg.max_bounces + cfg.bounce_hit_key_from)
        return bounce + 1 < bhf_p

    def _rank_at_sort(bounce):
        """Static: does bounce_sort(bounce) emit packed rank-1..3 keys
        for the rank-directed closest walk (cfg.rank_trace)?  Mirrors the
        cluster-key branch's own gating."""
        if closest_rank_fn is None or not cfg.sort_bounces:
            return False
        if cfg.sort_key != "cluster2":
            return False
        if not (tracer_kind == "pallas" and data.clu_planes is not None):
            return False
        nc_tot = data.clu_planes.shape[0] * data.clu_planes.shape[1]
        if nc_tot > 4095:
            return False
        bhf = (cfg.bounce_hit_key_from if cfg.bounce_hit_key_from >= 0
               else cfg.max_bounces + cfg.bounce_hit_key_from)
        if bounce >= bhf:  # hit-proxy sort: no exact keys to reuse
            return False
        from .ops import trace_pallas as _tp

        if (cfg.fused_broadphase
                and nc_tot <= _tp.BROADPHASE_MAX_CLUSTERS):
            return False  # the fused kernel doesn't emit rank-3 keys
        return True

    def bounce_sort(bounce, o, d, color, accum, idx, cur, alive, prev_tri,
                    carried_bp=None):
        """Compaction-sort one bounce's rays: broad-phase sort keys +
        the multi-operand lax.sort.  Width-agnostic like bounce_tail —
        the bounce >= 2 dispatch calls it at the previous bounce's
        live-prefix bucket width (live rays only ever shrink between
        sorts, so they all sit inside the previous sort's prefix and the
        suffix is entirely dead).  ``carried_bp`` is this bounce's
        (cid, nckey, cid2-or-packed...) tuple when the previous bounce's
        tail already computed the keys in its fused pair sweep
        (cfg.pair_broadphase) — the (N, NC) chain is then skipped here.
        Returns the permuted per-ray state plus (known_miss, carried_gk)
        — None when their config paths are off."""
        known_miss = None
        cluster1_bits = None  # set when the cluster1 key is active
        carried_gk = None  # global-seed key riding the sort (carry_seed)
        rank_keys_pre = None  # packed rank-1..3 keys (cfg.rank_trace)
        if cfg.sort_bounces:
            # Sorted compaction: live rays ordered by (direction octant,
            # origin Morton) so each traversal block's rays share BVH
            # nodes even after a diffuse bounce; dead rays sort last
            # into whole blocks that traversal skips at fixed cost.
            # Direction-major ordering measured best on the dragon
            # scene (blocks of near-parallel rays make tight traversal
            # frustums even when their origins span several tiles).
            m = _morton_512(o, data)
            octant = ((d[:, 0] > 0).astype(jnp.int32)
                      + 2 * (d[:, 1] > 0).astype(jnp.int32)
                      + 4 * (d[:, 2] > 0).astype(jnp.int32))
            nc_tot = (data.clu_planes.shape[0] * data.clu_planes.shape[1]
                      if (tracer_kind == "pallas"
                          and data.clu_planes is not None) else 1 << 30)
            if cfg.sort_key.startswith("cluster") and nc_tot <= 4095:
                # Group rays by their NEAREST slab-hit cluster (one
                # fused host-side broad phase), then direction cone,
                # then origin Morton: a block's rays share their first
                # traversal visit by construction instead of by the
                # dir6 proxy.  Cluster ids are Morton-ordered by the
                # builder, so nearby ids are nearby in space and the
                # id-major order keeps inter-block locality too.
                from .ops import trace_pallas as _tp

                want2 = cfg.sort_key in ("cluster2", "cluster2_nodir",
                                         "cluster3")
                want3 = cfg.sort_key == "cluster3"
                # per-bounce proxy override: late-bounce sorts swap the
                # exact (N, NC) broad phase for the free hit-cluster key
                # (see RenderConfig.bounce_hit_key_from)
                bhf = (cfg.bounce_hit_key_from if cfg.bounce_hit_key_from
                       >= 0 else cfg.max_bounces + cfg.bounce_hit_key_from)
                use_hit = (cfg.sort_key == "cluster1_hit"
                           or bounce >= bhf)
                if use_hit:
                    want2 = want3 = False
                # bit budget first: with many clusters (cbits = 12)
                # the third id would get 0 key bits — skip its extra
                # (N, NC) rank pass instead of paying it for nothing
                # (ADVICE round 3 #2)
                cbits = max(1, nc_tot.bit_length())
                db = (3 if cfg.sort_key == "cluster1_dir9"
                      else 0 if cfg.sort_key == "cluster2_nodir"
                      else 2)
                avail = 30 - cbits - 3 * db
                c2bits = min(cbits, max(0, avail)) if want2 else 0
                avail -= c2bits
                c3bits = min(cbits, max(0, avail)) if want3 else 0
                avail -= c3bits
                mbits = max(0, avail)
                want3 = want3 and c3bits > 0
                use_fused = (cfg.fused_broadphase and not want3
                             and not use_hit
                             and nc_tot <= _tp.BROADPHASE_MAX_CLUSTERS)
                gk_fused = None
                rank_on = _rank_at_sort(bounce)
                rank_keys_pre = None  # packed rank 1..3 keys to carry
                if carried_bp is not None:
                    # keys already computed by the previous bounce's
                    # fused shadow+bounce pair sweep (cfg.pair_broadphase)
                    assert want2 and not use_hit and not use_fused
                    cid, nckey = carried_bp[0], carried_bp[1]
                    if len(carried_bp) >= 4:  # packed ranks (rank_trace)
                        assert rank_on
                        cid2 = _tp.decode_cluster_key(carried_bp[2],
                                                      nc_tot)
                        rank_keys_pre = (nckey, carried_bp[2],
                                         carried_bp[3])
                    else:
                        cid2 = carried_bp[2]
                    cid3 = None
                elif rank_on:
                    # the exact broad phase emits the THIRD-nearest too
                    # (one variadic reduce — see nearest_cluster): ranks
                    # 1..2 drive the rank-directed walk, rank 3 is its
                    # resolution certificate; the sort key stays the
                    # cluster2 layout (cid | cid2 | cone | Morton)
                    assert want2 and not want3
                    cid, nckey, k2p, k3p = _tp.nearest_cluster(
                        o, d, alive, data.clu_planes, spec.bvh,
                        return_key=True, return_second=2,
                        return_packed=True)
                    cid2 = _tp.decode_cluster_key(k2p, nc_tot)
                    cid3 = None
                    rank_keys_pre = (nckey, k2p, k3p)
                elif use_fused:
                    # ONE pallas pass emits the nearest(-2) cluster
                    # keys AND the global-seed key together (VERDICT
                    # round 3 #2) — replacing the separate (N, NC)
                    # slab and (N, G) global XLA passes below.
                    k1f, k2f, gk_fused = _tp.broadphase_keys(
                        o, d, alive, data.clu_planes, data.tri_planes,
                        spec.bvh, want2=want2,
                        block=cfg.broadphase_block)
                    nckey = k1f
                    cid = _tp.decode_cluster_key(k1f, nc_tot)
                    if want2:
                        cid2 = _tp.decode_cluster_key(k2f, nc_tot)
                    cid3 = None
                elif use_hit:
                    # Cheap proxy broad phase: a bounce ray starts ON
                    # its previous hit, whose cluster box contains the
                    # origin — the exact nearest cluster IS that
                    # cluster for cluster-surface origins (slab entry
                    # 0).  Global-set origins (the floor) take the
                    # nearest SUPER's first cluster id (same Morton id
                    # space, coarser).  The (N, NC) slab becomes an
                    # (N, NS) one, ~15x cheaper; the miss fold uses
                    # the super entry t (a lower bound on every
                    # cluster entry — conservative, still exact).
                    s_per_h, _ = _tp.super_layout(spec.bvh)
                    sid, nckey = _tp.nearest_cluster(
                        o, d, alive, data.sup_planes[:, None, :],
                        spec.bvh, return_key=True)
                    nsp_h = data.sup_planes.shape[0]
                    own = jnp.minimum(
                        jnp.maximum(prev_tri, 0)
                        // spec.bvh.cluster_size,
                        jnp.int32(nc_tot - 1))
                    is_clu = (prev_tri >= 0) & (
                        prev_tri < spec.bvh.global_base)
                    cid = jnp.where(is_clu, own,
                                    jnp.minimum(sid * s_per_h,
                                                jnp.int32(nc_tot - 1)))
                    cid = jnp.where(sid >= nsp_h, jnp.int32(nc_tot),
                                    cid)
                elif want2:
                    # second(/third)-nearest cluster ids ride below
                    # the first (strictly finer grouping: rays sharing
                    # their first visits pack together)
                    res = _tp.nearest_cluster(
                        o, d, alive, data.clu_planes, spec.bvh,
                        return_key=True,
                        return_second=2 if want3 else 1)
                    cid, nckey, cid2 = res[0], res[1], res[2]
                    cid3 = res[3] if want3 else None
                else:
                    cid, nckey = _tp.nearest_cluster(
                        o, d, alive, data.clu_planes, spec.bvh,
                        return_key=True)
                if cfg.cluster_miss_fold and spec.bvh.num_global > 0:
                    # Rays whose NEAREST cluster is entered beyond
                    # their global-set hit cannot find a closer hit in
                    # any cluster (triangle t >= cluster entry t) —
                    # fold them into the NC group: they skip the
                    # kernel and take the host-side global hit.  One
                    # chop step of margin covers both keys' truncated
                    # mantissas.
                    gk = (gk_fused if use_fused and gk_fused is not None
                          else _tp.global_seed_keys(
                              o, d, alive, data.tri_planes, spec.bvh))
                    if cfg.carry_seed:
                        # this SAME per-ray key also seeds the kernel
                        # and resolves folded rays' hits AFTER the
                        # sort — carry it as a sort operand (+1 of 16)
                        # instead of recomputing the full-width
                        # global pass on the sorted rays (~16 ms at
                        # 1M; VERDICT round 3 #2).  Bit-identical:
                        # the sort permutes, values unchanged.
                        carried_gk = gk
                    tn_f = jax.lax.bitcast_convert_type(
                        nckey & ~jnp.int32((1 << 12) - 1), jnp.float32)
                    # margin: one chop step for the truncated
                    # mantissas; one more when the key came from the
                    # fused kernel (its Newton-refined t is within
                    # 2^-16 of the exact divide — a quarter step;
                    # the extra step folds strictly fewer rays,
                    # never wrongly)
                    g_plus = jax.lax.bitcast_convert_type(
                        (gk & ~jnp.int32(_tp.IDX_MASK))
                        + jnp.int32((2 if use_fused else 1) << 9),
                        jnp.float32)
                    beats = (gk < jnp.int32(_tp._MISS_KEY)) & (
                        tn_f >= g_plus)
                    cid = jnp.where(beats, jnp.int32(nc_tot), cid)
                # key layout: leading cluster id, cid2/cid3 below it,
                # direction cone (2 bits/axis = 64 cones; 3 with
                # "cluster1_dir9"; none with "cluster2_nodir"), then
                # origin Morton with whatever bits remain (budget
                # computed above, before the broad-phase call)
                shift = 30 - cbits
                key = cid << shift
                if c2bits:
                    shift -= c2bits
                    key = key | ((cid2 & ((1 << c2bits) - 1)) << shift)
                if c3bits:
                    shift -= c3bits
                    key = key | ((cid3 & ((1 << c3bits) - 1)) << shift)
                if db:
                    lvl = 1 << (db - 1)
                    q = jnp.clip(((d + 1.0) * lvl).astype(jnp.int32),
                                 0, 2 * lvl - 1)
                    dirq = ((q[:, 0] << (2 * db)) | (q[:, 1] << db)
                            | q[:, 2])
                    shift -= 3 * db
                    key = key | (dirq << shift)
                # top mbits Morton bits (m < 2^27: a no-op shift when
                # small scenes leave more room than Morton fills)
                key = key | (m >> max(0, 27 - mbits))
                cluster1_bits = cbits  # miss-fold decodes cid post-sort
            elif cfg.sort_key == "hybrid":
                # coarse origin cell (top 2 Morton bits/axis), then
                # direction octant, then fine origin Morton: blocks
                # share a region AND a direction cone.
                key = (((m >> 21) << 24) | (octant << 21)
                       | (m & 0x1FFFFF))
            elif cfg.sort_key in ("dir6", "dir9", "dir6_cluster"):
                # finer direction prefix: 2 (dir6) or 3 (dir9) bits per
                # axis = 64 / 512 cones, then origin Morton.  dir6
                # measured 391 -> 348 ms/sample over the octant key
                # once shadow coherence was decoupled (shadow_sort).
                bits = 3 if cfg.sort_key == "dir9" else 2
                lv = 1 << (bits - 1)
                q = jnp.clip(((d + 1.0) * lv).astype(jnp.int32),
                             0, 2 * lv - 1)
                dirq = ((q[:, 0] << (2 * bits)) | (q[:, 1] << bits)
                        | q[:, 2])
                if cfg.sort_key == "dir6_cluster":
                    # geometry-adaptive origin binning: the BVH leaf
                    # cluster the ray bounced off (same surface patch)
                    # outranks the Morton grid cell.  Measured WORSE
                    # than plain dir6 on dragon (353 vs 334 ms) —
                    # kept as a knob for differently shaped scenes.
                    clu_bin = jnp.clip(prev_tri, 0, 2**30) \
                        // spec.bvh.cluster_size
                    key = ((dirq << 24) | ((clu_bin & 0x3FF) << 14)
                           | ((m >> 13) & 0x3FFF))
                else:
                    key = ((dirq << (30 - 3 * bits))
                           | (m >> (3 * bits - 3)))
            else:  # "dir_major" — measured 22% over origin-major (r1)
                key = (octant << 27) | m
            key = jnp.where(alive, key, jnp.int32(2**30))
        else:
            # Partition only: live rays first, preserving tile order.
            key = jnp.where(alive, jnp.int32(0), jnp.int32(2**30))
        # One multi-operand sort carries every per-ray attribute with
        # the key — measured 8.6x cheaper than argsort + per-array
        # gathers (TPU gathers are slow; sort networks stream).
        # ``alive`` rides in the key itself (dead rays sort to the
        # 2^30 sentinel) instead of as a 16th operand.
        # Sorted mode uses is_stable=False: every per-ray result is
        # independent of block membership (tracers are exact per ray)
        # and radiance returns to its pixel through the carried
        # ``cur`` slot, so tie order is free and unstable multi-operand
        # sorts are cheaper.  Partition-only mode keeps is_stable=True:
        # ALL live keys are equal there, and stability is precisely
        # what preserves the tile-major coherence that mode exists for.
        operands = [key, o[:, 0], o[:, 1], o[:, 2],
                    d[:, 0], d[:, 1], d[:, 2]]
        if cfg.sort_pack_f16:
            # throughput + radiance ride as 3 packed f16-pair words
            # (see RenderConfig.sort_pack_f16) — geometry stays exact
            operands += [_pack2f16(color[:, 0], color[:, 1]),
                         _pack2f16(color[:, 2], accum[:, 0]),
                         _pack2f16(accum[:, 1], accum[:, 2])]
        else:
            operands += [color[:, 0], color[:, 1], color[:, 2],
                         accum[:, 0], accum[:, 1], accum[:, 2]]
        if carried_gk is not None:
            operands += [carried_gk]
        if rank_keys_pre is not None:
            # the packed rank keys ride the sort (3 more i32 operands,
            # ~+0.8 ms each at 1M by the x_sort marginal) instead of
            # recomputing the (N, NC) chain on the sorted rays (~+5 ms)
            operands += list(rank_keys_pre)
        operands += [idx, cur]
        s = jax.lax.sort(
            tuple(operands),
            dimension=0, is_stable=not cfg.sort_bounces, num_keys=1)
        o = jnp.stack(s[1:4], axis=1)
        d = jnp.stack(s[4:7], axis=1)
        if cfg.sort_pack_f16:
            c0, c1 = _unpack2f16(s[7])
            c2, a0 = _unpack2f16(s[8])
            a1, a2 = _unpack2f16(s[9])
            color = jnp.stack([c0, c1, c2], axis=1)
            accum = jnp.stack([a0, a1, a2], axis=1)
        else:
            color = jnp.stack(s[7:10], axis=1)
            accum = jnp.stack(s[10:13], axis=1)
        idx = s[-2]
        alive = s[0] < jnp.int32(2**30)
        cur = s[-1]
        pos_s = len(s) - 2
        rank_keys = None
        if rank_keys_pre is not None:
            rank_keys = tuple(s[pos_s - 3:pos_s])
            pos_s -= 3
        if carried_gk is not None:
            carried_gk = s[pos_s - 1]
        if "sort_extra" in ABLATE_EXTRA:
            # one more 15-operand compaction sort, identical operand mix
            # (key perturbed so nothing CSEs with the real sort)
            s2 = jax.lax.sort(
                tuple([operands[0] ^ jnp.int32(1)] + list(operands[1:])),
                dimension=0, is_stable=not cfg.sort_bounces, num_keys=1)
            accum = accum + s2[1][:, None] * 1e-30
        if (cluster1_bits is not None and cfg.cluster_miss_fold
                and tracer_kind == "pallas"):
            # broad-phase-proved cluster misses: the cluster1 key packs
            # them contiguously (cid == nc_tot) just below the dead
            # sentinel, so they form fully-dead traversal tiles once
            # masked out of the kernel query below
            known_miss = alive & (
                (s[0] >> (30 - cluster1_bits)) == jnp.int32(nc_tot))
        return (o, d, color, accum, idx, cur, alive, known_miss,
                carried_gk, rank_keys)

    def bounce_tail(bounce, o, d, color, accum, idx, alive, known_miss,
                    carried_gk, rank_keys=None):
        """Closest hit -> shade -> NEE shadow -> bounce continuation for
        one bounce — everything after the compaction sort.  Width-
        agnostic: operates on whatever PREFIX of the per-ray arrays it
        is given (the live-prefix dispatch in the bounce loop calls it
        at a static bucket width covering the live rays; suffix lanes
        are untouched, since masked math never updates dead lanes).
        Returns the updated per-ray state, the shadow-ray count, and
        telemetry."""
        tele: Dict[str, jnp.ndarray] = {}
        if cfg.export_rays:
            # strided sample of this bounce's closest-pass rays for the
            # ray-weighted cluster builder (RenderConfig.export_rays)
            st = cfg.export_rays
            tele[f"rays_b{bounce}"] = jnp.concatenate(
                [o[::st], d[::st],
                 jnp.full((o[::st].shape[0], 1), jnp.inf),
                 alive[::st, None].astype(jnp.float32)], axis=1)
        # Fully dead tiles (the compacted suffix after a bounce sort,
        # image padding) are skipped inside the pallas kernel from the
        # mask itself at ~zero cost.
        gkey = None
        if known_miss is not None and spec.bvh.num_global > 0:
            # ONE fused global-set pass serves both the kernel's host seed
            # (folded rays excluded via the INIT sentinel) and the
            # host-side hits of the folded rays below.  With carry_seed
            # the pass already ran for the sort key's miss fold and its
            # result rode the sort — no recompute at all.
            from .ops import trace_pallas as _tp

            gkey = (carried_gk if carried_gk is not None
                    else _tp.global_seed_keys(o, d, alive, data.tri_planes,
                                              spec.bvh))
        m_kernel = alive if known_miss is None else alive & ~known_miss
        seed_arg = (jnp.where(known_miss, jnp.int32(_tp._INIT_KEY), gkey)
                    if gkey is not None and cfg.host_seed else None)
        if rank_keys is not None:
            # rank-directed cluster-major walk over the packed candidate
            # keys that rode this bounce's compaction sort, certified
            # against the rank-3 entry, fallback re-trace for the rest
            # (RenderConfig.rank_trace)
            hit, rvis, n_unres = closest_rank_fn(o, d, m_kernel,
                                                 rank_keys, seed_arg)
            if cfg.telemetry:
                tele[f"visits_b{bounce}"] = rvis
                tele[f"rank_unresolved_b{bounce}"] = n_unres
        else:
            hit = closest_fn(
                o, d, m_kernel,
                block=pblock if bounce == 0 else None,
                # bounce 0: every ray shares the camera origin — the
                # pallas tracer uses the bake_origin()-shifted planes
                # when enabled
                baked=(bounce == 0),
                seed=seed_arg)
            if cfg.telemetry and tracer_kind == "pallas":
                hit, tele[f"visits_b{bounce}"] = hit
        if gkey is not None:
            # Global-set hits of the folded rays: same chopped-t packing
            # the kernel would have returned (exact t is recomputed from
            # the shade row either way).  Sky rays stay misses.
            from .ops import trace_pallas as _tp

            gfound = known_miss & (gkey < jnp.int32(_tp._MISS_KEY))
            hit = hit._replace(
                t=jnp.where(gfound, _tp._key_to_t(gkey), hit.t),
                tri=jnp.where(
                    gfound,
                    spec.bvh.global_base + (gkey & _tp.IDX_MASK),
                    hit.tri))

        if cfg.env_map and spec.has_env_map:
            escaped = alive & ~hit.found
            accum += jnp.where(escaped[:, None],
                               color * _env_lookup(data.env_map, d), 0.0)

        alive = alive & hit.found  # megakernel's break-on-miss (:246-247)
        # this bounce's hit triangle keys the NEXT bounce's dir6_cluster
        # sort (consumed before that sort runs — no need to carry it)
        prev_tri = hit.tri
        tri = jnp.maximum(hit.tri, 0)

        # One row gather fetches the hit triangle's affine normal map,
        # albedo, and material id together (separate gathers would each pay
        # the TPU per-index gather cost).
        if "shade_stub" in ABLATE_EXTRA:
            # REMOVAL probe (image wrong, timing only): replace the row
            # gather with a constant broadcast — prices the real gather
            # by ablation, cross-checking the addition probe shade_extra
            # (an added gather can break fusions the real one doesn't)
            row = jnp.broadcast_to(data.shade_table[0],
                                   (tri.shape[0],
                                    data.shade_table.shape[1]))
        else:
            row = data.shade_table[tri]
        if "shade_extra" in ABLATE_EXTRA:
            # one more full-width 20-wide row gather (indices perturbed so
            # it cannot CSE with the real gather)
            xrow = data.shade_table[
                jnp.minimum(tri + 1, data.shade_table.shape[0] - 1)]
            accum = accum + xrow[:, 12:15] * 1e-30
        if "halton_extra" in ABLATE_EXTRA:
            # 5 more Halton dims (past every real dimension in the
            # schedule, so the sequence semantics stay untouched)
            hx = sum(sampling.halton(idx, 64 + 5 * bounce + j)
                     for j in range(5))
            accum = accum + hx[:, None] * 1e-30
        if ("bp_extra" in ABLATE_EXTRA and tracer_kind == "pallas"
                and data.clu_planes is not None):
            # one more exact (N, NC) nearest-cluster broad phase on this
            # bounce's (post-sort) rays
            from .ops import trace_pallas as _tp

            xcid = _tp.nearest_cluster(o, d, alive, data.clu_planes,
                                       spec.bvh)
            accum = accum + xcid.astype(jnp.float32)[:, None] * 1e-30
        if tracer_kind == "pallas":
            # The pallas kernel's packed key chops t to <= 512 ulp (2^-14
            # relative) — enough to eat into the absolute 1e-3 shadow offset
            # on thin grazing geometry (uv_test building, VERDICT r2 #4).
            # Recompute the EXACT hit distance from the winning triangle's
            # geometric plane [n, n.v0], carried in the shade row the pass
            # gathers anyway: t = (n.v0 - n.o) / (n.d).
            nrow = row[:, 16:19]
            den = jnp.sum(nrow * d, axis=-1)
            num = row[:, 19] - jnp.sum(nrow * o, axis=-1)
            t_hit = num / jnp.where(jnp.abs(den) < 1e-20,
                                    jnp.where(den < 0, -1e-20, 1e-20), den)
        else:
            t_hit = hit.t
        # Dead lanes keep pos = o: a BIG_T miss distance would overflow the
        # light-distance math into inf*0 NaNs (masked but trips debug_nans).
        pos = o + d * jnp.where(alive, t_hit, 0.0)[:, None]
        # Barycentric vertex-normal interpolation as an affine map of the
        # hit point, ns = M pos + m0 (see scene.py shade_table — identical
        # to weights (1-u-v, u, v) on corners, matching
        # interpolateVertexAttribute, reference: Raytracing.metal:60-73).
        ns = (row[:, 0:3] * pos[:, 0:1] + row[:, 3:6] * pos[:, 1:2]
              + row[:, 6:9] * pos[:, 2:3] + row[:, 9:12])
        ns = _normalize(ns)

        base_color = row[:, 12:15]
        mid = None  # materialized only for the gated extensions below

        if cfg.enable_textures and spec.has_textures:
            # Base-color texture modulation (extension; reference parses
            # texcoords and ships texture assets but never shades them —
            # SURVEY.md §2d).  uv(p) = A p + b via the per-triangle affine
            # rows (one 8-wide gather), wrap addressing, nearest sample
            # with OBJ's bottom-left origin (flip v).
            uvrow = data.uv_table[tri]
            u_t = (uvrow[:, 0] * pos[:, 0] + uvrow[:, 2] * pos[:, 1]
                   + uvrow[:, 4] * pos[:, 2] + uvrow[:, 6])
            v_t = (uvrow[:, 1] * pos[:, 0] + uvrow[:, 3] * pos[:, 1]
                   + uvrow[:, 5] * pos[:, 2] + uvrow[:, 7])
            fu = u_t - jnp.floor(u_t)
            fv = v_t - jnp.floor(v_t)
            mid = row[:, 15].astype(jnp.int32)
            hw = data.tex_hw[mid]  # (N, 2)
            if cfg.texture_filter == "bilinear":
                # texel-center convention: sample at (u*W - 0.5, v*H - 0.5)
                # and lerp the 2x2 neighborhood (4 gathers; the nearest
                # path below pays 1) — clamped at edges, matching the
                # wrap-at-UV / clamp-at-texel addressing of the nearest
                # path so the two filters agree at texel centers.
                x = fu * hw[:, 1] - 0.5
                y = (1.0 - fv) * hw[:, 0] - 0.5
                x0 = jnp.floor(x)
                y0 = jnp.floor(y)
                wx = (x - x0)[:, None]
                wy = (y - y0)[:, None]
                x0i = jnp.clip(x0.astype(jnp.int32), 0, hw[:, 1] - 1)
                x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, hw[:, 1] - 1)
                y0i = jnp.clip(y0.astype(jnp.int32), 0, hw[:, 0] - 1)
                y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, hw[:, 0] - 1)
                t00 = data.tex_stack[mid, y0i, x0i]
                t01 = data.tex_stack[mid, y0i, x1i]
                t10 = data.tex_stack[mid, y1i, x0i]
                t11 = data.tex_stack[mid, y1i, x1i]
                texel = ((t00 * (1 - wx) + t01 * wx) * (1 - wy)
                         + (t10 * (1 - wx) + t11 * wx) * wy)
            else:
                xi = jnp.clip((fu * hw[:, 1]).astype(jnp.int32),
                              0, hw[:, 1] - 1)
                yi = jnp.clip(((1.0 - fv) * hw[:, 0]).astype(jnp.int32),
                              0, hw[:, 0] - 1)
                texel = data.tex_stack[mid, yi, xi]
            base_color = base_color * texel

        if cfg.enable_emission:
            mid = row[:, 15].astype(jnp.int32)
            accum += jnp.where(alive[:, None], color * mats.emission[mid], 0.0)

        # One uniformly random light per ray (reference: :272-275).
        lu = sampling.halton(idx, sampling.bounce_dim(bounce, 0))
        light_idx = select_light(lu, lcount)
        r_light = jnp.stack(
            [sampling.halton(idx, sampling.bounce_dim(bounce, 1)),
             sampling.halton(idx, sampling.bounce_dim(bounce, 2))], axis=-1)
        ls = sample_lights(data.lights, light_idx, r_light, pos)

        ndotl = jnp.clip(jnp.sum(ns * ls.direction, axis=-1), 0.0, 1.0)
        lcolor = ls.color * ndotl[:, None] * lcount  # :331-335

        # Diffuse throughput for this vertex's NEE (reference: :339).
        dcolor = jnp.where(alive[:, None], color * base_color, color)

        do_shadow = alive & (jnp.linalg.norm(lcolor, axis=-1) > 1e-4)  # :341
        n_shadow = jnp.sum(do_shadow.astype(jnp.int32))
        shadow_o = pos + ns * 1e-3  # :350
        sdist = ls.distance - 1e-3
        # Host-side global-set occlusion (pallas + cfg.host_seed): rays
        # the scene-spanning planes occlude are resolved HERE and masked
        # out of the kernel query — after the shadow re-sort they compact
        # into fully-dead tiles the kernel skips at ~zero cost.  They
        # still count as traced shadow rays (the test happened, host-side
        # — same accounting as the former in-kernel seed).
        sk1 = sk2 = socc = None
        # free hit-cluster shadow key, globally or from a bounce threshold
        # (see RenderConfig.shadow_hit_key_from)
        shf = (cfg.shadow_hit_key_from if cfg.shadow_hit_key_from >= 0
               else cfg.max_bounces + cfg.shadow_hit_key_from)
        use_shk = cfg.shadow_hit_key or bounce >= shf
        if tracer_kind == "pallas" and data.clu_planes is not None:
            # Fused shadow broad phase (cfg.fused_broadphase): the shadow
            # sort's (N, NC) segment slab and the global-set occlusion in
            # ONE pallas pass (VERDICT round 3 #2); the separate XLA
            # passes below remain for the non-default key shapes.  The
            # slab runs under the do_shadow mask instead of the narrower
            # kernel_shadow — immaterial: globally-occluded rays are
            # masked out of both the segment fold and the shadow key
            # downstream either way.
            from .ops import trace_pallas as _tp

            nc_tot_sf = data.clu_planes.shape[0] * data.clu_planes.shape[1]
            want_skey = (cfg.shadow_sort and cfg.compaction
                         and (bounce > 0 or cfg.shadow_sort_primary)
                         and cfg.sort_key.startswith("cluster")
                         and nc_tot_sf <= 4095
                         and not use_shk)
            want_gocc = cfg.host_seed and spec.bvh.num_global > 0
            if (cfg.fused_broadphase and (want_skey or want_gocc)
                    and nc_tot_sf <= _tp.BROADPHASE_MAX_CLUSTERS):
                sk1, sk2, socc = _tp.broadphase_keys(
                    shadow_o, ls.direction, do_shadow, data.clu_planes,
                    data.tri_planes, spec.bvh, max_t=sdist,
                    want2=cfg.shadow_key2 and want_skey,
                    with_clusters=want_skey, any_mode=True,
                    block=cfg.broadphase_block)
        if (tracer_kind == "pallas" and cfg.host_seed
                and spec.bvh.num_global > 0):
            from .ops import trace_pallas as _tp

            g_occ = (socc > 0 if socc is not None
                     else _tp.global_any_hit(shadow_o, ls.direction, sdist,
                                             do_shadow, data.tri_planes,
                                             spec.bvh))
            kernel_shadow = do_shadow & ~g_occ
        else:
            g_occ = jnp.zeros_like(do_shadow)
            kernel_shadow = do_shadow

        # ---- Bounce continuation, computed BEFORE the shadow trace.
        # Everything here depends only on pre-shadow values (occlusion
        # affects only the NEE accumulation below), so the hoist is pure
        # code motion — and it makes the next bounce's ray direction
        # available to the fused shadow+bounce broad phase
        # (cfg.pair_broadphase).  Reference path: always cosine-weighted
        # diffuse, throughput = dcolor (:384-391).  Extension
        # (cfg.enable_specular, the reference's declared TODO
        # README.md:8): per-ray lobe choice between the diffuse lobe and
        # a Phong lobe around the mirror direction, weighted by Ks/Kd.
        if cfg.enable_refraction:
            # Dielectric extension (the reference's own declared next
            # feature, reference README.md:8; Ni/d are carried in the
            # ABI, ShaderTypes.h:105 -> types.Material).  A material with
            # dissolve < 1 and Ni > 0 is (1 - dissolve) transmissive; its
            # diffuse layer — including this vertex's NEE — carries only
            # the `dissolve` fraction.
            mid_r = row[:, 15].astype(jnp.int32)
            ni_r = mats.refraction_index[mid_r]
            dvis = mats.dissolve[mid_r]
            transmissive = alive & (dvis < 1.0) & (ni_r > 0.0)
            nee_w = jnp.where(transmissive, dvis, 1.0)[:, None]
        else:
            nee_w = 1.0
        r_bounce = jnp.stack(
            [sampling.halton(idx, sampling.bounce_dim(bounce, 3)),
             sampling.halton(idx, sampling.bounce_dim(bounce, 4))], axis=-1)
        local = sampling.sample_cosine_weighted_hemisphere(r_bounce)
        d_diffuse = sampling.align_hemisphere_with_normal(local, ns)
        d_in = d  # incoming direction
        color_in = color  # incoming throughput (pre-lobe)

        if cfg.enable_specular:
            mid = row[:, 15].astype(jnp.int32)
            spec_color = mats.specular[mid]
            shininess = mats.specular_exponent[mid][:, None]
            kd_max = jnp.max(base_color, axis=-1)
            ks_max = jnp.max(spec_color, axis=-1)
            p_spec = ks_max / jnp.maximum(kd_max + ks_max, 1e-6)
            # lobe-choice dimension beyond the reference's schedule so the
            # shared dims keep pixel parity when Ks == 0
            xi = sampling.halton(
                idx, 2 + 5 * cfg.max_bounces + bounce)
            take_spec = alive & (xi < p_spec) & (ks_max > 0.0)
            refl = (d_in - 2.0
                    * jnp.sum(d_in * ns, axis=-1, keepdims=True) * ns)
            # Phong-lobe sample about the mirror direction
            cos_a = r_bounce[:, 1:2] ** (1.0 / (shininess + 1.0))
            sin_a = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_a * cos_a))
            phi = 2.0 * jnp.pi * r_bounce[:, 0:1]
            lobe = jnp.concatenate(
                [sin_a * jnp.cos(phi), cos_a, sin_a * jnp.sin(phi)],
                axis=-1)
            d_spec = sampling.align_hemisphere_with_normal(lobe, refl)
            # keep specular samples above the surface
            below = jnp.sum(d_spec * ns, axis=-1, keepdims=True) <= 0.0
            d_spec = jnp.where(below, refl, d_spec)
            p_spec_c = jnp.clip(p_spec, 1e-6, 1.0 - 1e-6)[:, None]
            spec_tp = color * spec_color / p_spec_c
            diff_tp = jnp.where(alive[:, None],
                                color * base_color / (1.0 - p_spec_c),
                                color)
            d_next = jnp.where(take_spec[:, None], d_spec, d_diffuse)
            color_next = jnp.where(take_spec[:, None], spec_tp, diff_tp)
        else:
            d_next = d_diffuse
            color_next = dcolor

        if cfg.enable_refraction:
            # Transmissive branch, chosen with probability (1 - dissolve):
            # Snell refraction with Schlick-Fresnel reflect/refract choice
            # and total internal reflection, on the side-aware shading
            # normal.  Both the branch choice and the Fresnel choice are
            # importance-sampled with weight 1 (unbiased single-sample
            # estimator); extra Halton dimensions sit past the specular
            # lobe's so the reference schedule stays untouched.  Glass is
            # tinted by Kd when present (near-black Kd means "clear" —
            # common in glass MTLs — not "absorb everything").  Shadow
            # rays still treat glass as a full occluder (no transmittance
            # along shadow segments; documented limitation).
            xi_t = sampling.halton(
                idx, 2 + 5 * cfg.max_bounces + cfg.max_bounces + bounce)
            take_t = transmissive & (xi_t >= dvis)
            inside = jnp.sum(d_in * ns, axis=-1) > 0.0  # back-face hit
            n_eff = jnp.where(inside[:, None], -ns, ns)
            ci = jnp.clip(-jnp.sum(d_in * n_eff, axis=-1), 0.0, 1.0)
            ni_s = jnp.maximum(ni_r, 1.0 + 1e-6)
            eta = jnp.where(inside, ni_s, 1.0 / ni_s)
            sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - ci * ci)
            tir = sin2_t > 1.0
            cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
            d_refr = _normalize(eta[:, None] * d_in
                                + (eta * ci - cos_t)[:, None] * n_eff)
            d_refl = _normalize(d_in + 2.0 * ci[:, None] * n_eff)
            f0 = ((ni_s - 1.0) / (ni_s + 1.0)) ** 2
            fr = jnp.where(tir, 1.0,
                           f0 + (1.0 - f0) * (1.0 - ci) ** 5)
            xi_f = sampling.halton(
                idx, 2 + 5 * cfg.max_bounces + 2 * cfg.max_bounces + bounce)
            refl_t = xi_f < fr
            d_next = jnp.where(
                take_t[:, None],
                jnp.where(refl_t[:, None], d_refl, d_refr), d_next)
            kd_max_r = jnp.max(base_color, axis=-1, keepdims=True)
            tint = jnp.where(kd_max_r > 1e-4, base_color, 1.0)
            t_tp = jnp.where(alive[:, None], color_in * tint, color_in)
            color_next = jnp.where(take_t[:, None], t_tp, color_next)
            # refracted rays continue THROUGH the surface: offset along
            # the inward side-aware normal
            off_n = jnp.where(take_t[:, None],
                              jnp.where(refl_t[:, None], n_eff, -n_eff),
                              ns)
            o_next = pos + off_n * 1e-3
        else:
            # bit-identical to the shadow origin (:350 twice) — the
            # shared-origin property the pair broad phase fuses over
            o_next = shadow_o

        # ---- Fused shadow + next-bounce broad phase (VERDICT r4 #2):
        # the shadow rank-1 key and the next bounce's rank-2 sort keys in
        # ONE variadic (N, NC) sweep over the shared origin — the six
        # per-axis (box - o) subtrahends are computed once.  Bit-identical
        # to the separate chains (tests/test_broadphase.py); the bounce
        # keys ride back to the next bounce_sort via ``pair_bp``.
        pair_scid = None
        pair_bp = None
        if _pair_at(bounce):
            from .ops import trace_pallas as _tp

            rank_next = _rank_at_sort(bounce + 1)
            res = _tp.nearest_cluster_pair(
                shadow_o, ls.direction, sdist, kernel_shadow,
                d_next, alive, data.clu_planes, spec.bvh,
                ranks=3 if rank_next else 2,
                return_packed=rank_next)
            pair_scid = res[0]
            pair_bp = res[1:]

        if cfg.shadow_sort and cfg.compaction and (
                bounce > 0 or cfg.shadow_sort_primary):
            # Shadow re-sort (see RenderConfig.shadow_sort): shadow origins
            # are the scattered hit points of this bounce's rays, not the
            # sorted origins the bounce key arranged — and the shadow
            # direction is a function of the origin (it points at the
            # light), so (light, origin-Morton) alone makes blocks coherent
            # in both.  Measured shadow passes visit MORE clusters than
            # closest passes without this (mean 13.5 vs 9.0, BASELINE.md).
            m = _morton_512(shadow_o, data)
            # light index in the top bits, sized to the static light count
            # so the key NEVER reaches the 2**30 dead sentinel (a fixed
            # <<27 shift would collide at >= 8 lights and silently drop
            # those shadows); rays with no shadow work sort last into
            # whole dead blocks the kernel exits at fixed cost
            bits_l = max(1, (lcount - 1).bit_length())
            nc_tot_s = (data.clu_planes.shape[0] * data.clu_planes.shape[1]
                        if (tracer_kind == "pallas"
                            and data.clu_planes is not None) else 1 << 30)
            if cfg.sort_key.startswith("cluster") and nc_tot_s <= 4095:
                # Cluster-first shadow key: group by the nearest cluster
                # the SEGMENT can hit (likeliest occluder), then light,
                # then origin Morton.  Segments with NO cluster overlap
                # are PROVEN clear — with cluster_miss_fold they skip the
                # kernel entirely (global-set occlusion was already folded
                # into kernel_shadow above).
                from .ops import trace_pallas as _tp

                if use_shk:
                    # FREE grouping proxy: the shadow ray starts ON this
                    # bounce's hit triangle, whose cluster box contains
                    # the origin — the segment's nearest slab-hit cluster
                    # is almost always that cluster.  The exact (N, NC)
                    # broad phase is replaced by a divide of the hit id;
                    # the segment fold falls back to the SUPER level
                    # (conservative: no super overlap => no cluster
                    # overlap), an (N, NS) slab ~15x cheaper.
                    # global-set-origin rays (tri >= global_base — e.g.
                    # the floor, the dominant hit surface) get their OWN
                    # group id nc_tot_s instead of an arbitrary clamped
                    # real cluster's (ADVICE round 3 #4); sort-key-only,
                    # and nc_tot_s < 2^cbits_s keeps the key below the
                    # dead sentinel
                    scid = jnp.where(
                        tri >= spec.bvh.global_base, jnp.int32(nc_tot_s),
                        jnp.minimum(tri // spec.bvh.cluster_size,
                                    nc_tot_s - 1))
                    if cfg.cluster_miss_fold:
                        sid = _tp.nearest_cluster(
                            shadow_o, ls.direction, kernel_shadow,
                            data.sup_planes[:, None, :], spec.bvh,
                            max_t=sdist)
                        kernel_shadow = kernel_shadow & (
                            sid < data.sup_planes.shape[0])
                else:
                    scid2 = None
                    if sk1 is not None:
                        # fused pass already ran above
                        scid = _tp.decode_cluster_key(sk1, nc_tot_s)
                        if cfg.shadow_key2:
                            scid2 = _tp.decode_cluster_key(sk2, nc_tot_s)
                    elif cfg.shadow_key2:
                        # second-nearest cluster id below the first, the
                        # shadow-side mirror of the cluster2 bounce key
                        scid, scid2 = _tp.nearest_cluster(
                            shadow_o, ls.direction, kernel_shadow,
                            data.clu_planes, spec.bvh, max_t=sdist,
                            return_second=1)
                    elif pair_scid is not None:
                        # the fused pair sweep above already computed it
                        scid = pair_scid
                    else:
                        scid = _tp.nearest_cluster(shadow_o, ls.direction,
                                                   kernel_shadow,
                                                   data.clu_planes,
                                                   spec.bvh, max_t=sdist)
                    if cfg.cluster_miss_fold:
                        kernel_shadow = kernel_shadow & (scid < nc_tot_s)
                cbits_s = max(1, nc_tot_s.bit_length())
                c2bits_s = (min(cbits_s, max(0, 30 - cbits_s - bits_l))
                            if cfg.shadow_key2 and not use_shk
                            else 0)
                mbits_s = max(0, 30 - cbits_s - c2bits_s - bits_l)
                skey = (scid << (30 - cbits_s)) | (light_idx << mbits_s)
                if c2bits_s:
                    skey = skey | ((scid2 & ((1 << c2bits_s) - 1))
                                   << (mbits_s + bits_l))
                skey = skey | (m >> max(0, 27 - mbits_s))
            else:
                shift = 29 - bits_l
                mm = m if shift >= 27 else (m >> (27 - shift))
                skey = (light_idx << shift) | mm
            skey = jnp.where(kernel_shadow, skey, jnp.int32(2**30))
            slot = jnp.arange(alive.shape[0], dtype=jnp.int32)
            ss = jax.lax.sort(
                (skey, shadow_o[:, 0], shadow_o[:, 1], shadow_o[:, 2],
                 ls.direction[:, 0], ls.direction[:, 1], ls.direction[:, 2],
                 sdist, slot),
                dimension=0, is_stable=False, num_keys=1)
            res = any_fn(jnp.stack(ss[1:4], axis=1),
                         jnp.stack(ss[4:7], axis=1), ss[7],
                         ss[0] < jnp.int32(2**30),
                         block=(sblock_last
                                if bounce == cfg.max_bounces - 1
                                else sblock))
            if cfg.telemetry and tracer_kind == "pallas":
                res, tele[f"shadow_visits_b{bounce}"] = res
            # un-permute through a second sort on the carried slot (18x
            # cheaper than a scatter); the 1-bit occlusion result rides in
            # the low bit below the (unique) slot — a single-operand sort
            packed = (ss[8] << 1) | res.astype(jnp.int32)
            u = jax.lax.sort(packed, dimension=0, is_stable=False)
            occluded = (u & 1) > 0
        else:
            occluded = any_fn(shadow_o, ls.direction, sdist, kernel_shadow,
                              block=pblock if bounce == 0 else None)
            if cfg.telemetry and tracer_kind == "pallas":
                occluded, tele[f"shadow_visits_b{bounce}"] = occluded
        if cfg.export_rays:
            # strided shadow-SEGMENT sample (finite max_t) for the
            # ray-weighted cluster builder (RenderConfig.export_rays)
            st = cfg.export_rays
            tele[f"srays_b{bounce}"] = jnp.concatenate(
                [shadow_o[::st], ls.direction[::st], sdist[::st, None],
                 kernel_shadow[::st, None].astype(jnp.float32)], axis=1)
        visible = do_shadow & ~occluded & ~g_occ
        if cfg.telemetry:
            # Occlusion-outcome split (round 4): ordering levers (occluder
            # hints, mid-order) can only help OCCLUDED rays terminate
            # early — unoccluded rays must exhaust their candidate set
            # regardless of visit order.  The per-bounce occluded fraction
            # bounds what any ordering change can recover from the
            # bounce-2 shadow exhaustion tail (VERDICT round 3 #4).
            tele[f"shadow_occn_b{bounce}"] = jnp.sum(
                (do_shadow & (occluded | g_occ)).astype(jnp.int32))
        accum += jnp.where(visible[:, None], lcolor * dcolor * nee_w,
                           0.0)  # :371-373

        # continuation state was computed above, before the shadow trace
        o, d, color = o_next, d_next, color_next
        return (o, d, color, accum, alive, prev_tri, n_shadow, pair_bp,
                tele)

    live_bound = None  # live-prefix length after the last sort
    sort_presence = [None]  # (known_miss?, carried_gk?) statics
    # next-bounce sort keys computed by the previous tail's fused pair
    # sweep (cfg.pair_broadphase) — presence is static per bounce
    carried_bp = None
    for bounce in range(cfg.max_bounces):
        # set per bounce by the cluster1 sort: live rays whose broad phase
        # proved they cannot hit any CLUSTER (only sky / the global set)
        known_miss = None
        carried_gk = None
        rank_keys_b = None  # this bounce's packed rank keys (post-sort)
        assert (carried_bp is not None) == (bounce > 0
                                            and _pair_at(bounce - 1))
        if (cfg.compaction and (bounce > 0 or cfg.sort_primary)
                and (cfg.sort_last_bounce
                     or bounce < cfg.max_bounces - 1)):
            sort_widths = _bucket_widths(p, pad_to, cfg.live_widths)
            if (bounce >= 2 and live_bound is not None
                    and sort_presence[0] is not None
                    and not cfg.telemetry and len(sort_widths) > 1):
                # keys + compaction sort at the PREVIOUS bounce's live-
                # prefix bucket (VERDICT round 3 #1): both broad-phase
                # key passes and the 16-operand sort shrink with
                # occupancy; the suffix is all-dead and passes through.
                from .ops import trace_pallas as _tp

                has_km_s, has_cg_s, _ = sort_presence[0]
                has_rk_s = _rank_at_sort(bounce)

                def mks(w):
                    def branch(o, d, color, accum, idx, cur, alive,
                               prev_tri, *bp_a):
                        bp = (tuple(x[:w] for x in bp_a) if bp_a
                              else None)
                        (oo, dd, cc, aa, ii, uu, al, km, cg,
                         rk) = bounce_sort(bounce, o[:w], d[:w], color[:w],
                                           accum[:w], idx[:w], cur[:w],
                                           alive[:w], prev_tri[:w],
                                           carried_bp=bp)
                        assert (km is not None) == has_km_s
                        assert (cg is not None) == has_cg_s
                        assert (rk is not None) == has_rk_s

                        def cat(x, full):
                            if w == p:
                                return x
                            return jnp.concatenate([x, full[w:]], axis=0)

                        res = (cat(oo, o), cat(dd, d), cat(cc, color),
                               cat(aa, accum), cat(ii, idx), cat(uu, cur),
                               cat(al, alive))
                        if has_km_s:
                            res += ((km if w == p else jnp.concatenate(
                                [km, jnp.zeros((p - w,), bool)])),)
                        if has_cg_s:
                            res += ((cg if w == p else jnp.concatenate(
                                [cg, jnp.full((p - w,), _tp._INIT_KEY,
                                              jnp.int32)])),)
                        if has_rk_s:
                            # suffix lanes are dead — sentinel candidates
                            res += tuple(
                                (x if w == p else jnp.concatenate(
                                    [x, jnp.full((p - w,), _tp._NC_SENT,
                                                 jnp.int32)]))
                                for x in rk)
                        return res
                    return branch

                bi = jnp.int32(0)
                for wj in sort_widths[:-1]:
                    bi = bi + (live_bound > wj).astype(jnp.int32)
                out = jax.lax.switch(
                    bi, [mks(w) for w in sort_widths],
                    o, d, color, accum, idx, cur, alive, prev_tri,
                    *(carried_bp or ()))
                o, d, color, accum, idx, cur, alive = out[:7]
                j = 7
                if has_km_s:
                    known_miss = out[j]
                    j += 1
                if has_cg_s:
                    carried_gk = out[j]
                    j += 1
                if has_rk_s:
                    rank_keys_b = tuple(out[j:j + 3])
            else:
                (o, d, color, accum, idx, cur, alive, known_miss,
                 carried_gk, rank_keys_b) = bounce_sort(
                     bounce, o, d, color, accum, idx, cur, alive,
                     prev_tri, carried_bp=carried_bp)
                sort_presence[0] = (known_miss is not None,
                                    carried_gk is not None,
                                    rank_keys_b is not None)

        n_alive = jnp.sum(alive.astype(jnp.int32))
        closest_count += n_alive
        sorted_this = (cfg.compaction
                       and (bounce > 0 or cfg.sort_primary)
                       and cfg.sort_bounces
                       and (cfg.sort_last_bounce
                            or bounce < cfg.max_bounces - 1))
        if sorted_this:
            # live rays are now a contiguous prefix of this length; the
            # NEXT bounce's sort may run at its bucket (alive only
            # shrinks between sorts)
            live_bound = n_alive
        if cfg.telemetry:
            # per-bounce occupancy: live rays entering this bounce
            tele_stats[f"live_b{bounce}"] = n_alive
        # ---- bounce tail at the live-prefix width (VERDICT round 3 #1).
        # After this bounce's compaction sort the live rays are a
        # contiguous prefix of traced length n_alive; lax.switch picks
        # the smallest static bucket width covering them, so every
        # post-sort stage (kernel grid, shade-row gather, Halton, light
        # sampling, the shadow re-sort pair) runs proportional to LIVE
        # occupancy instead of the padded lane count.  Suffix lanes pass
        # through untouched; identical image up to ~1-ulp per-width XLA
        # codegen rounding (see RenderConfig.live_widths).
        widths = _bucket_widths(p, pad_to, cfg.live_widths)
        if (sorted_this and not cfg.telemetry and len(widths) > 1
                and bounce >= cfg.live_from_bounce):
            opt = [a for a in (known_miss, carried_gk) if a is not None]
            has_km = known_miss is not None
            has_cg = carried_gk is not None
            has_rk = rank_keys_b is not None
            if has_rk:
                opt = opt + list(rank_keys_b)
            has_bp = _pair_at(bounce)

            def mk(w):
                def branch(o, d, color, accum, idx, alive, prev_tri,
                           *opt_a):
                    km = opt_a[0][:w] if has_km else None
                    j_o = int(has_km)
                    cg = opt_a[j_o][:w] if has_cg else None
                    j_o += int(has_cg)
                    rk = (tuple(x[:w] for x in opt_a[j_o:j_o + 3])
                          if has_rk else None)
                    oo, dd, cc, aa, al, pt, nsh, bp, _ = bounce_tail(
                        bounce, o[:w], d[:w], color[:w], accum[:w],
                        idx[:w], alive[:w], km, cg, rk)
                    assert (bp is not None) == has_bp
                    if w == p:
                        return (oo, dd, cc, aa, al, pt, nsh,
                                *(bp or ()))

                    def cat(x, full):
                        return jnp.concatenate([x, full[w:]], axis=0)

                    # suffix lanes of the carried keys are dead: their
                    # sort key hits the dead sentinel regardless, so the
                    # pad values are semantically inert
                    from .ops import trace_pallas as _tp

                    bp_pad = tuple(
                        jnp.concatenate(
                            [x, jnp.full((p - w,), _tp._NC_SENT
                                         if i == 1 or len(bp) >= 4
                                         else 0, jnp.int32)])
                        for i, x in enumerate(bp or ()))
                    return (cat(oo, o), cat(dd, d), cat(cc, color),
                            cat(aa, accum), cat(al, alive),
                            cat(pt, prev_tri), nsh, *bp_pad)
                return branch

            bi = jnp.int32(0)
            for wj in widths[:-1]:
                bi = bi + (n_alive > wj).astype(jnp.int32)
            out_t = jax.lax.switch(
                bi, [mk(w) for w in widths],
                o, d, color, accum, idx, alive, prev_tri, *opt)
            (o, d, color, accum, alive, prev_tri, n_shadow) = out_t[:7]
            carried_bp = tuple(out_t[7:]) if has_bp else None
        else:
            (o, d, color, accum, alive, prev_tri, n_shadow, carried_bp,
             tele) = bounce_tail(bounce, o, d, color, accum, idx, alive,
                                 known_miss, carried_gk, rank_keys_b)
            tele_stats.update(tele)
        shadow_count += n_shadow
        if cfg.telemetry:
            tele_stats[f"shadow_b{bounce}"] = n_shadow

    stats = {"closest_rays": closest_count, "shadow_rays": shadow_count,
             **tele_stats}
    if cfg.compaction and cfg.max_bounces > 1:
        # Restore pixel order by sorting on the carried pixel index —
        # ~18x cheaper than a scatter on TPU.
        s = jax.lax.sort((cur, accum[:, 0], accum[:, 1], accum[:, 2]),
                         dimension=0, is_stable=False, num_keys=1)
        radiance = jnp.stack(s[1:4], axis=1)
    else:
        radiance = accum
    return radiance[:n], stats


def render_sample(
    data: SceneData,
    spec: SceneSpec,
    cfg: RenderConfig,
    offsets: jnp.ndarray,  # (H*W,) i32 per-pixel Halton offsets
    frame_index: jnp.ndarray,  # () i32 sample index
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Render one full-frame sample; returns ((H, W, 3) radiance, stats).

    Pixels are traced in tile-major order when the image divides into
    ray-block-sized tiles (coherent traversal blocks), then restored to
    row-major for the output image."""
    px, py = pixel_coords(cfg)
    tiles = tile_shape(cfg)
    if tiles is not None:
        th, tw = tiles
        px = _tile_flatten(px.reshape(cfg.height, cfg.width), th, tw)
        py = _tile_flatten(py.reshape(cfg.height, cfg.width), th, tw)
        offsets = _tile_flatten(offsets.reshape(cfg.height, cfg.width), th, tw)
    radiance, stats = render_rays(data, spec, cfg, px, py, offsets,
                                  frame_index)
    if tiles is not None:
        return _tile_unflatten(radiance, cfg.height, cfg.width, th, tw), stats
    return radiance.reshape(cfg.height, cfg.width, 3), stats


def accumulate(prev: jnp.ndarray, sample: jnp.ndarray,
               frame_index) -> jnp.ndarray:
    """Progressive average (reference: Raytracing.metal:395-401)."""
    fi = jnp.asarray(frame_index, jnp.float32)
    return (prev * fi + sample) / (fi + 1.0)


@functools.partial(jax.jit, static_argnames=("spec", "cfg", "k"),
                   donate_argnums=(3, 4))
def _progressive_step(data, offsets, frame_index, accum_img, ray_totals, *,
                      spec, cfg, k=1):
    # Ray counters fold into a donated device array instead of being
    # fetched per step: fetching would host-sync every sample and defeat
    # async dispatch — the analog of the reference's triple buffering
    # (reference: Renderer.swift:33-34, 285-287).  f32 accumulation: each
    # per-sample count is an exact small int; the total is a metric, not an
    # invariant.
    def one(fi, accum_img, ray_totals):
        sample, stats = render_sample(data, spec, cfg, offsets, fi)
        new_totals = ray_totals + jnp.stack(
            [stats["closest_rays"], stats["shadow_rays"]]).astype(jnp.float32)
        return accumulate(accum_img, sample, fi), new_totals

    if k == 1:
        return one(frame_index, accum_img, ray_totals)
    # k samples per dispatch (RenderConfig.samples_per_dispatch): the
    # same sequential accumulate fold, inside one program — dispatch
    # latency is paid once per k samples instead of per sample.
    return jax.lax.fori_loop(
        0, k, lambda i, c: one(frame_index + i, *c),
        (accum_img, ray_totals))


class Renderer:
    """Progressive renderer: owns the jitted sample step and the accumulation
    state — the framework's equivalent of the reference ``Renderer``
    (reference: Renderer.swift:12-357), headless.

    The (accumulation image, frame_index, seed) triple is the complete
    checkpoint state; ``state_dict``/``load_state`` make a converging render
    resumable (SURVEY.md §5 checkpoint/resume).
    """

    def __init__(self, scene: Scene, cfg: RenderConfig):
        self.scene = scene
        self.cfg = cfg
        self.data, self.spec = scene.build(
            cluster_size=cfg.cluster_size, builder=cfg.bvh_builder,
            presplit=cfg.bvh_presplit, builder_alpha=cfg.bvh_alpha)
        self.offsets = make_pixel_offsets(cfg)
        self.frame_index = 0
        self.accum = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
        self.ray_totals = jnp.zeros((2,), jnp.float32)
        # samples per jitted dispatch (0 = auto: small scenes are
        # dispatch-latency-bound; see RenderConfig.samples_per_dispatch)
        # batch r4-6 (plane_sphere 256², 32 samples): spd 1/4/8/16 =
        # 6.4/6.2/6.0/6.2 ms/sample — 8 edges out 4 on the smallest
        # scenes.  Large scenes: spd2 178.1 vs spd1 180.4 on dragon
        # 1024² (batch r4-7, same process) while spd4 measured WORSE
        # (189.9 vs 186.0, batch r4-2) — 2 amortizes the ~2 ms dispatch
        # without spd4's loss (suspected live-range/loop overhead).
        self.samples_per_dispatch = cfg.samples_per_dispatch or (
            8 if cfg.num_pixels <= 256 * 256
            else 4 if cfg.num_pixels <= 512 * 512 else 2)

    def reset(self) -> None:
        """Restart progressive accumulation (zero the average, frame 0) —
        the analog of the reference's resize/camera-move reset
        (reference: Renderer.swift:353-355)."""
        self.frame_index = 0
        self.accum = jnp.zeros(
            (self.cfg.height, self.cfg.width, 3), jnp.float32)
        self.ray_totals = jnp.zeros((2,), jnp.float32)

    def step(self, k: Optional[int] = None) -> None:
        """Render ``k`` samples (default: the dispatch batch size) for
        every pixel and fold them into the average.

        Fully async: nothing here touches host memory, so consecutive
        ``step()`` calls enqueue without an intervening device fence."""
        k = self.samples_per_dispatch if k is None else k
        self.accum, self.ray_totals = _progressive_step(
            self.data, self.offsets, jnp.int32(self.frame_index),
            self.accum, self.ray_totals, spec=self.spec, cfg=self.cfg, k=k)
        self.frame_index += k

    @property
    def total_closest_rays(self) -> int:
        """Total closest-hit rays traced (fetches the device counter)."""
        return int(self.ray_totals[0])

    @property
    def total_shadow_rays(self) -> int:
        """Total shadow rays traced (fetches the device counter)."""
        return int(self.ray_totals[1])

    def refine(self, stride: int = 64) -> bool:
        """Feedback-driven re-cluster (VERDICT r4 #8): rebuild the cluster
        BVH to THIS render's MEASURED ray distribution, then continue
        progressively.

        Renders one extra telemetry sample (NOT folded into the average)
        with RenderConfig.export_rays to collect a strided sample of the
        bounce rays and shadow segments the frame actually traces, then
        rebuilds with the ``sah_rays`` builder, which scores candidate
        splits by measured ray-slab hits instead of the surface-area
        proxy.  Image-identical — clustering is a performance property
        (tests/test_feedback.py) — and checkpoint-compatible: the
        fingerprint is cached at first use so a refined renderer's
        checkpoints interoperate with unrefined ones.  Returns False
        when the scene/config exports no usable sample (e.g. bruteforce
        tracer)."""
        import dataclasses as _dc

        ecfg = _dc.replace(self.cfg, export_rays=stride)
        _, stats = jax.jit(lambda d, o: render_sample(
            d, self.spec, ecfg, o, jnp.int32(self.frame_index)))(
                self.data, self.offsets)
        rows = [np.asarray(v) for k, v in sorted(stats.items())
                if k.startswith(("rays_b", "srays_b"))]
        if not rows:
            return False
        rays = np.concatenate(rows, axis=0)
        if not (rays[:, 7] > 0).any():
            return False
        self.fingerprint()  # pin the pre-refine identity (see docstring)
        self.data, self.spec = self.scene.build(
            cluster_size=self.cfg.cluster_size, builder="sah_rays",
            presplit=self.cfg.bvh_presplit,
            builder_alpha=self.cfg.bvh_alpha, rays=rays)
        return True

    def render(self, spp: Optional[int] = None) -> np.ndarray:
        """Render ``spp`` more samples (default cfg.spp); returns
        (H, W, 3) f32.  Dispatches in ``samples_per_dispatch`` batches
        with an exact remainder step, so ``total_samples`` advances by
        exactly ``spp`` (checkpoint semantics unchanged)."""
        spp = self.cfg.spp if spp is None else spp
        target = self.total_samples + spp
        while self.total_samples < target:
            self.step(min(self.samples_per_dispatch,
                          target - self.total_samples))
        return np.asarray(jax.device_get(self.accum))

    @property
    def image(self) -> np.ndarray:
        return np.asarray(jax.device_get(self.accum))

    # -- checkpoint / resume (SURVEY.md §5) --------------------------------
    def fingerprint(self) -> str:
        """Scene+config identity baked into checkpoints: resuming a
        checkpoint from a different scene or incompatible config would
        silently corrupt a long render.  Tracer choice is deliberately
        excluded (tracers are pixel-parity interchangeable)."""
        cached = getattr(self, "_fingerprint", None)
        if cached is not None:
            # pinned at first use: refine() rebuilds the clustering (a
            # perf-only property), and checkpoints must stay portable
            # across refined/unrefined builds of the same scene
            return cached
        s = (f"{self.spec.bvh}|L{self.spec.light_count}"
             f"|M{self.spec.material_count}|E{int(self.spec.has_env_map)}"
             f"|{self.cfg.width}x{self.cfg.height}|b{self.cfg.max_bounces}"
             f"|seed{self.cfg.seed}")
        import hashlib

        self._fingerprint = hashlib.sha1(s.encode()).hexdigest()[:16]
        return self._fingerprint

    @property
    def total_samples(self) -> int:
        """Samples folded into ``accum`` so far.  The plain renderer folds
        one per step; ``ShardedRenderer`` overrides (one step = one sample
        per device on the spp axis).  This — not the step counter — is the
        portable progress unit checkpoints store, so a checkpoint written
        by a sharded renderer resumes correctly in a plain one and vice
        versa (VERDICT round 2 #8)."""
        return self.frame_index

    def _set_total_samples(self, total: int) -> None:
        self.frame_index = int(total)

    def state_dict(self) -> dict:
        return {
            "accum": np.asarray(self.accum),
            "total_samples": self.total_samples,
            "seed": self.cfg.seed,
            "fingerprint": self.fingerprint(),
            "total_closest_rays": self.total_closest_rays,
            "total_shadow_rays": self.total_shadow_rays,
        }

    def load_state(self, state: dict) -> None:
        if int(state["seed"]) != self.cfg.seed:
            raise ValueError("checkpoint seed does not match config seed")
        if "fingerprint" in state:
            got = str(np.asarray(state["fingerprint"]).item()
                      if hasattr(state["fingerprint"], "item")
                      else state["fingerprint"])
            if got != self.fingerprint():
                raise ValueError(
                    "checkpoint scene/config fingerprint does not match: "
                    f"checkpoint {got}, this renderer {self.fingerprint()}")
        if "total_samples" in state:
            total = int(state["total_samples"])
        else:  # round-2 checkpoints: the plain renderer's step == sample
            total = int(state["frame_index"])
        self.accum = jnp.asarray(state["accum"], jnp.float32)
        self._set_total_samples(total)
        self.ray_totals = jnp.asarray(
            [float(state.get("total_closest_rays", 0)),
             float(state.get("total_shadow_rays", 0))], jnp.float32)

    @staticmethod
    def checkpoint_path(path: str) -> str:
        """``np.savez`` appends ``.npz`` when absent; normalize in BOTH
        save and load so ``--checkpoint ckpt`` round-trips."""
        return path if path.endswith(".npz") else path + ".npz"

    def save(self, path: str) -> None:
        np.savez(self.checkpoint_path(path), **self.state_dict())

    def load(self, path: str) -> None:
        with np.load(self.checkpoint_path(path)) as f:
            self.load_state({k: f[k] for k in f.files})
