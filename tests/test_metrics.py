"""Metrics/observability tests (SURVEY.md §5)."""

import jax.numpy as jnp
import numpy as np

from metal_raytracing_tpu.renderer import Renderer, make_pixel_offsets
from metal_raytracing_tpu.scenes import plane_sphere_scene
from metal_raytracing_tpu.types import RenderConfig
from metal_raytracing_tpu.utils.metrics import benchmark_renderer, wavefront_stats
from metal_raytracing_tpu.utils.profiling import timed


def _cfg(**kw):
    base = dict(width=32, height=32, max_bounces=2, tracer="bvh",
                ray_block=128)
    base.update(kw)
    return RenderConfig(**base)


def test_benchmark_renderer_counts():
    r = Renderer(plane_sphere_scene(32, 32), _cfg())
    res = benchmark_renderer(r, samples=2, warmup=1)
    # a step folds samples_per_dispatch samples (auto-batched for small
    # scenes); BenchResult counts TRUE samples so per-sample figures hold
    assert res.samples == 2 * r.samples_per_dispatch
    assert res.rays > 0
    assert res.seconds > 0
    assert res.mrays_per_sec > 0
    assert res.frame_seconds(64) == 64 * res.per_sample_seconds
    d = res.asdict()
    assert "mrays_per_sec" in d and d["scene"] == "plane_sphere"


def test_wavefront_stats_occupancy_decreases():
    scene = plane_sphere_scene(32, 32)
    cfg = _cfg(max_bounces=3)
    data, spec = scene.build(cluster_size=cfg.cluster_size)
    offsets = make_pixel_offsets(cfg)
    stats = wavefront_stats(data, spec, cfg, offsets)
    occ = stats["occupancy_per_bounce"]
    assert len(occ) == 3
    assert occ[0] == 1.0  # all primaries live
    assert occ[0] >= occ[1] >= occ[2]  # rays only die
    assert stats["rays_per_pixel"] <= 2 * cfg.max_bounces


def test_timed_harness():
    f = lambda x: x * 2.0
    dt, out = timed(jnp.asarray, np.ones((4,)), iters=2)
    assert dt >= 0
