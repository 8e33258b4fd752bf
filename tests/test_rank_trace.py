"""Rank-directed cluster-major traversal (RenderConfig.rank_trace) and the
fused shadow+bounce broad phase (RenderConfig.pair_broadphase).

The rank walk covers each ray's rank-1..K candidate clusters from the
exact broad phase; rays whose best cannot be certified against the
rank-(K+1) entry re-trace through the hierarchical kernel seeded with the
walk's best.  The composition must reproduce the full hierarchical
tracer's image (and its exact per-ray results up to cross-cluster
chopped-t tie-winner identity, which the certificate margins exclude in
practice).  Runs in interpret mode on CPU (conftest).

Scenes: coatball is the smallest ladder scene ABOVE the flat-kernel
threshold (144 padded clusters > FLAT_MAX_CLUSTERS=128), so it exercises
the hierarchical/rank path; plane_sphere exercises the flat-scene gating
(rank_trace must silently no-op there).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from metal_raytracing_tpu.ops import trace_pallas as TP
from metal_raytracing_tpu.renderer import make_pixel_offsets, render_sample
from metal_raytracing_tpu.scenes import get_scene
from metal_raytracing_tpu.types import RenderConfig


@pytest.fixture(scope="module")
def coatball():
    scene = get_scene("coatball", 64, 64)
    data, spec = scene.build(cluster_size=384, builder="sah_free")
    assert not TP._use_flat(spec.bvh, None)  # hierarchical path
    return data, spec


def _rays(n, seed, spread=6.0):
    rng = np.random.RandomState(seed)
    o = jnp.asarray(rng.uniform(-spread, spread, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    mask = jnp.asarray(rng.rand(n) > 0.15)
    return o, d, mask


def test_rank_walk_plus_fallback_matches_full_kernel(coatball):
    """trace_closest_rank over ranks 1..2 + certificate + seeded full
    kernel on the uncertified rest == trace_closest, ray for ray."""
    data, spec = coatball
    o, d, mask = _rays(512, seed=41)
    seed_k = TP.global_seed_keys(o, d, mask, data.tri_planes, spec.bvh)
    _, k1, k2, k3 = TP.nearest_cluster(
        o, d, mask, data.clu_planes, spec.bvh, return_key=True,
        return_second=2, return_packed=True)
    key, base = TP.trace_closest_rank(
        o, d, mask, [k1, k2], data.tri_planes, spec.bvh, seed_key=seed_k)
    cert = TP.rank_certificate(key, k3)
    unresolved = np.asarray(mask & ~cert)
    fb = TP.trace_closest(o, d, mask & ~cert, data.sup_planes,
                          data.clu_planes, data.tri_planes, spec.bvh,
                          seed_key=key, seed_base=base, exact_uv=False)
    found_r = np.asarray(key < jnp.int32(TP._MISS_KEY))
    t_r = np.asarray(TP._key_to_t(key))
    tri_r = np.where(found_r, np.asarray(base)
                     + (np.asarray(key) & TP.IDX_MASK), -1)
    t = np.where(unresolved, np.asarray(fb.t), t_r)
    tri = np.where(unresolved, np.asarray(fb.tri), tri_r)

    ref = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                           data.tri_planes, spec.bvh,
                           seed_key=seed_k, exact_uv=False)
    np.testing.assert_array_equal(tri, np.asarray(ref.tri))
    np.testing.assert_array_equal(t, np.asarray(ref.t))
    # sanity: the certificate resolves a real majority on this workload
    n_live = int(np.asarray(mask).sum())
    assert unresolved.sum() < 0.5 * n_live


def test_certificate_is_conservative(coatball):
    """Certified rays' results must already equal the full kernel's
    (the fallback may only ever FIX uncertified rays)."""
    data, spec = coatball
    o, d, mask = _rays(512, seed=43)
    seed_k = TP.global_seed_keys(o, d, mask, data.tri_planes, spec.bvh)
    _, k1, k2, k3 = TP.nearest_cluster(
        o, d, mask, data.clu_planes, spec.bvh, return_key=True,
        return_second=2, return_packed=True)
    key, base = TP.trace_closest_rank(
        o, d, mask, [k1, k2], data.tri_planes, spec.bvh, seed_key=seed_k)
    cert = np.asarray(TP.rank_certificate(key, k3)) & np.asarray(mask)
    ref = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                           data.tri_planes, spec.bvh,
                           seed_key=seed_k, exact_uv=False)
    found_r = np.asarray(key < jnp.int32(TP._MISS_KEY))
    tri_r = np.where(found_r, np.asarray(base)
                     + (np.asarray(key) & TP.IDX_MASK), -1)
    np.testing.assert_array_equal(tri_r[cert], np.asarray(ref.tri)[cert])
    np.testing.assert_array_equal(
        np.asarray(TP._key_to_t(key))[cert], np.asarray(ref.t)[cert])


def test_renderer_rank_trace_matches_default(coatball):
    """Full renderer at rank_trace=2 == the default pipeline, bit-for-bit
    on the coatball extensions config (specular + emission)."""
    data, spec = coatball
    cfg = RenderConfig(width=64, height=64, max_bounces=3, tracer="pallas",
                       enable_specular=True, enable_emission=True)
    offs = make_pixel_offsets(cfg)
    ref, _ = render_sample(data, spec, cfg, offs, jnp.int32(0))
    got, stats = render_sample(
        data, spec, dataclasses.replace(cfg, rank_trace=2, telemetry=True),
        offs, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
    # the telemetry reports the fallback population per sorted bounce
    assert "rank_unresolved_b1" in stats and "rank_unresolved_b2" in stats
    assert int(stats["rank_unresolved_b1"]) < int(stats["live_b1"])


def test_renderer_pair_broadphase_matches_default(coatball):
    """pair_broadphase fuses the bounce-b shadow chain with the
    bounce-(b+1) sort-key chain — bit-identical keys, identical image;
    composed with rank_trace it must stay identical too."""
    data, spec = coatball
    cfg = RenderConfig(width=64, height=64, max_bounces=3, tracer="pallas",
                       enable_specular=True, enable_emission=True)
    offs = make_pixel_offsets(cfg)
    ref, _ = render_sample(data, spec, cfg, offs, jnp.int32(0))
    pair, _ = render_sample(
        data, spec, dataclasses.replace(cfg, pair_broadphase=True),
        offs, jnp.int32(0))
    np.testing.assert_array_equal(np.asarray(pair), np.asarray(ref))
    both, _ = render_sample(
        data, spec,
        dataclasses.replace(cfg, pair_broadphase=True, rank_trace=2),
        offs, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(both), np.asarray(ref),
                               atol=1e-6)


def test_rank_trace_noops_on_flat_scene():
    """Scenes under the flat-kernel threshold must gate rank_trace off
    (the flat kernel has no rank path) and still render identically."""
    scene = get_scene("plane_sphere", 64, 64)
    data, spec = scene.build(cluster_size=384, builder="sah_free")
    assert TP._use_flat(spec.bvh, None)
    cfg = RenderConfig(width=64, height=64, max_bounces=2, tracer="pallas")
    offs = make_pixel_offsets(cfg)
    ref, _ = render_sample(data, spec, cfg, offs, jnp.int32(0))
    got, _ = render_sample(
        data, spec, dataclasses.replace(cfg, rank_trace=2),
        offs, jnp.int32(0))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
