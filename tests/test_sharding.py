"""Multi-chip tests without a cluster (SURVEY.md §4 item 5): 8 virtual CPU
devices via xla_force_host_platform_device_count (tests/conftest.py).
Sharded renders must equal the single-device render."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_raytracing_tpu.io.image import rmse
from metal_raytracing_tpu.parallel import (
    ShardedRenderer, make_mesh, render_sample_spp_sharded,
    render_sample_tile_sharded)
from metal_raytracing_tpu.renderer import Renderer, make_pixel_offsets, render_sample
from metal_raytracing_tpu.scenes import plane_sphere_scene
from metal_raytracing_tpu.types import RenderConfig

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


@pytest.fixture(scope="module")
def setup():
    scene = plane_sphere_scene(32, 32)
    cfg = RenderConfig(width=32, height=32, max_bounces=2, ray_block=128)
    data, spec = scene.build()
    offsets = make_pixel_offsets(cfg)
    return scene, cfg, data, spec, offsets


def test_tile_sharded_matches_single_device(setup):
    scene, cfg, data, spec, offsets = setup
    ref, ref_stats = render_sample(data, spec, cfg, offsets, jnp.int32(0))
    mesh = make_mesh(8, tile=8, spp=1)
    got, stats = render_sample_tile_sharded(
        data, spec, cfg, offsets, jnp.int32(0), mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
    assert int(stats["closest_rays"]) == int(ref_stats["closest_rays"])
    assert int(stats["shadow_rays"]) == int(ref_stats["shadow_rays"])


def test_spp_sharded_matches_sequential_mean(setup):
    scene, cfg, data, spec, offsets = setup
    mesh = make_mesh(8, tile=1, spp=8)
    got, _ = render_sample_spp_sharded(
        data, spec, cfg, offsets, jnp.int32(0), mesh)
    # sequential mean of samples 0..7
    acc = np.zeros((32, 32, 3), np.float64)
    for k in range(8):
        s, _ = render_sample(data, spec, cfg, offsets, jnp.int32(k))
        acc += np.asarray(s, np.float64)
    np.testing.assert_allclose(np.asarray(got), acc / 8.0, atol=1e-5)


def test_2d_mesh_tile_and_spp(setup):
    scene, cfg, data, spec, offsets = setup
    mesh = make_mesh(8, tile=4, spp=2)
    got, _ = render_sample_tile_sharded(
        data, spec, cfg, offsets, jnp.int32(0), mesh)
    acc = np.zeros((32, 32, 3), np.float64)
    for k in range(2):
        s, _ = render_sample(data, spec, cfg, offsets, jnp.int32(k))
        acc += np.asarray(s, np.float64)
    np.testing.assert_allclose(np.asarray(got), acc / 2.0, atol=1e-5)


def test_sharded_renderer_progressive(setup):
    scene, cfg, data, spec, offsets = setup
    r = ShardedRenderer(scene, cfg, make_mesh(8, tile=1, spp=8), mode="spp")
    img = r.render(16)  # two steps of 8 samples
    assert r.total_samples == 16

    ref = Renderer(scene, cfg)
    ref_img = ref.render(16)
    assert rmse(img, ref_img) < 1e-5


def test_sharded_renderer_tile_mode(setup):
    scene, cfg, data, spec, offsets = setup
    r = ShardedRenderer(scene, cfg, make_mesh(8, tile=2, spp=4), mode="tile")
    img = r.render(4)
    ref = Renderer(scene, cfg)
    ref_img = ref.render(4)
    assert rmse(img, ref_img) < 1e-5


def test_pallas_tracer_under_shard_map(setup):
    """The flagship single-chip path (Pallas kernels, interpret mode on
    CPU) composed with the multi-chip path (shard_map tile sharding) —
    the two features exercised TOGETHER (VERDICT round 2 #5): a
    pallas_call-inside-shard_map layout issue would otherwise surface
    only on a real pod."""
    import dataclasses

    scene, cfg, data, spec, offsets = setup
    pcfg = dataclasses.replace(cfg, tracer="pallas")
    ref, _ = render_sample(data, spec, pcfg, offsets, jnp.int32(0))
    mesh = make_mesh(8, tile=8, spp=1)
    got, _ = render_sample_tile_sharded(
        data, spec, pcfg, offsets, jnp.int32(0), mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_sharded_defaults_with_samples_per_dispatch(setup):
    """The SHIPPED default perf config (cluster2 rank-2 broad phase,
    shadow_hit_key_from=-1, miss fold, host seed) under tile+spp sharding,
    with samples_per_dispatch > 1 honored by the sharded step (VERDICT
    round 4 weak #6): k-batched stepping must equal one-at-a-time
    stepping bit-for-bit (the fori fold replays the same accumulate)."""
    import dataclasses

    scene, cfg, *_ = setup
    pcfg = dataclasses.replace(cfg, tracer="pallas")
    assert pcfg.sort_key == "cluster2" and pcfg.shadow_hit_key_from == -1
    mesh = make_mesh(8, tile=2, spp=4)
    batched = ShardedRenderer(scene, pcfg, mesh, mode="tile")
    batched.step(2)  # two sharded steps in ONE dispatch
    assert batched.total_samples == 8

    stepped = ShardedRenderer(scene, pcfg, mesh, mode="tile")
    stepped.step(1)
    stepped.step(1)
    assert stepped.total_samples == 8
    np.testing.assert_array_equal(np.asarray(batched.accum),
                                  np.asarray(stepped.accum))
    np.testing.assert_array_equal(np.asarray(batched.ray_totals),
                                  np.asarray(stepped.ray_totals))


def test_sharded_checkpoint_resumes_in_plain_renderer(setup, tmp_path):
    """Checkpoints store total SAMPLES, not steps: a ShardedRenderer
    checkpoint (one step = samples_per_step samples) must resume in a
    plain Renderer with correct progressive weighting (VERDICT r2 #8)."""
    scene, cfg, *_ = setup
    r = ShardedRenderer(scene, cfg, make_mesh(8, tile=1, spp=8), mode="spp")
    r.render(8)  # one sharded step = 8 samples
    path = str(tmp_path / "ck.npz")
    r.save(path)

    plain = Renderer(scene, cfg)
    plain.load(path)
    assert plain.total_samples == 8
    plain.render(4)  # 4 more samples -> 12 total
    ref = Renderer(scene, cfg)
    ref_img = ref.render(12)
    assert rmse(plain.image, ref_img) < 1e-5


def test_sharded_resume_rejects_partial_step(setup, tmp_path):
    """A checkpoint at a non-step-multiple sample count cannot resume on
    a mesh whose step granularity doesn't divide it — reject loudly
    instead of silently misweighting the progressive average."""
    scene, cfg, *_ = setup
    plain = Renderer(scene, cfg)
    plain.render(3)
    path = str(tmp_path / "ck3.npz")
    plain.save(path)
    r = ShardedRenderer(scene, cfg, make_mesh(8, tile=1, spp=8), mode="spp")
    with pytest.raises(ValueError, match="samples"):
        r.load(path)
