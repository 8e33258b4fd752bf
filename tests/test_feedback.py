"""Feedback-driven re-cluster (VERDICT r4 #8): the export_rays telemetry
and the ray-weighted ``sah_rays`` builder (accel.sah_free_clusters(rays=)).

The builder only changes the CLUSTERING (a performance property); traced
results must stay bit-identical to the brute-force oracle, and the
measured-ray sample must round-trip through the renderer stats."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_raytracing_tpu import accel
from metal_raytracing_tpu import renderer as R
from metal_raytracing_tpu.ops import trace as T
from metal_raytracing_tpu.scenes import plane_sphere_scene
from metal_raytracing_tpu.types import RenderConfig


def _sample_rays(m=256, seed=3):
    rng = np.random.RandomState(seed)
    o = rng.uniform(-3, 3, (m, 3)).astype(np.float32)
    d = rng.normal(size=(m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    maxt = np.where(rng.rand(m) < 0.5, np.inf, 5.0).astype(np.float32)
    live = (rng.rand(m) < 0.9).astype(np.float32)
    return np.concatenate([o, d, maxt[:, None], live[:, None]], axis=1)


def test_sah_rays_invariants():
    rng = np.random.RandomState(0)
    v0 = rng.uniform(-2, 2, size=(777, 3)).astype(np.float32)
    e1 = rng.uniform(-0.3, 0.3, size=(777, 3)).astype(np.float32)
    e2 = rng.uniform(-0.3, 0.3, size=(777, 3)).astype(np.float32)
    order, node_lo, node_hi, spec = accel.build_cluster_bvh(
        v0, e1, e2, cluster_size=64, branching=8, builder="sah_rays",
        rays=_sample_rays())
    real = order[order >= 0]
    assert sorted(real.tolist()) == list(range(777))
    # triangles stay inside their leaf AABB
    nclustered = spec.num_clusters * spec.cluster_size
    corder = order[:nclustered]
    got = corder >= 0
    p0 = v0[corder[got]]
    leaf_of = (np.arange(nclustered) // spec.cluster_size)[got]
    lo = node_lo[spec.first_leaf + leaf_of]
    hi = node_hi[spec.first_leaf + leaf_of]
    assert (p0 >= lo - 1e-5).all() and (p0 <= hi + 1e-5).all()


def test_sah_rays_none_matches_sah_free():
    """Without a ray sample the builder degrades to sah_free exactly."""
    rng = np.random.RandomState(1)
    v0 = rng.uniform(-2, 2, size=(500, 3)).astype(np.float32)
    e1 = rng.uniform(-0.3, 0.3, size=(500, 3)).astype(np.float32)
    e2 = rng.uniform(-0.3, 0.3, size=(500, 3)).astype(np.float32)
    a = accel.build_cluster_bvh(v0, e1, e2, cluster_size=64,
                                builder="sah_rays", rays=None)
    b = accel.build_cluster_bvh(v0, e1, e2, cluster_size=64,
                                builder="sah_free")
    np.testing.assert_array_equal(a[0], b[0])


def test_sah_rays_trace_parity():
    scene = plane_sphere_scene(32, 32)
    data, spec = scene.build(cluster_size=64, branching=8,
                             builder="sah_rays", rays=_sample_rays(512))
    rng = np.random.RandomState(7)
    o = jnp.asarray(rng.uniform(-3, 3, (256, 3)).astype(np.float32))
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    mask = jnp.ones((256,), bool)
    ref = jax.jit(lambda o, d: T.trace_closest_bruteforce(
        o, d, mask, data.geometry))(o, d)
    got = jax.jit(lambda o, d: T.trace_closest(
        o, d, mask, data.geometry, data.node_lo, data.node_hi, spec.bvh,
        block=128))(o, d)
    np.testing.assert_array_equal(np.asarray(got.tri >= 0),
                                  np.asarray(ref.tri >= 0))
    hits = np.asarray(ref.tri >= 0)
    np.testing.assert_allclose(np.asarray(got.t)[hits],
                               np.asarray(ref.t)[hits], rtol=1e-5)


def test_export_rays_roundtrip():
    """export_rays returns strided (M, 8) bounce/shadow row tables whose
    rebuild renders the identical image (clustering is perf-only)."""
    size = 32
    cfg = RenderConfig(width=size, height=size, max_bounces=2,
                       tracer="pallas", samples_per_dispatch=1)
    scene = plane_sphere_scene(size, size)
    bkw = dict(cluster_size=cfg.cluster_size, builder=cfg.bvh_builder)
    data, spec = scene.build(**bkw)
    offsets = R.make_pixel_offsets(cfg)
    ecfg = dataclasses.replace(cfg, export_rays=4)
    img1, stats = jax.jit(lambda d, o: R.render_sample(
        d, spec, ecfg, o, jnp.int32(0)))(data, offsets)
    keys = sorted(k for k in stats
                  if k.startswith(("rays_b", "srays_b")))
    assert "rays_b1" in keys and "srays_b0" in keys
    rows = [np.asarray(stats[k]) for k in keys]
    for r in rows:
        assert r.shape == (size * size // 4, 8)
    rays = np.concatenate(rows, axis=0)
    # bounce rows carry inf max_t, shadow rows a finite segment length
    assert np.isinf(np.asarray(stats["rays_b1"])[:, 6]).all()
    s0 = np.asarray(stats["srays_b0"])
    assert np.isfinite(s0[s0[:, 7] > 0, 6]).all()
    assert (rays[:, 7] > 0).sum() > 0
    # the exported sample must NOT change the image itself
    img0, _ = jax.jit(lambda d, o: R.render_sample(
        d, spec, cfg, o, jnp.int32(0)))(data, offsets)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img0),
                               atol=1e-6)
    # rebuild to the measured distribution: identical image
    data2, spec2 = scene.build(**{**bkw, "builder": "sah_rays"},
                               rays=rays)
    img2, _ = jax.jit(lambda d, o: R.render_sample(
        d, spec2, cfg, o, jnp.int32(0)))(data2, offsets)
    rmse = float(np.sqrt(np.mean(
        (np.asarray(img2) - np.asarray(img0)) ** 2)))
    assert rmse < 1e-5, rmse
