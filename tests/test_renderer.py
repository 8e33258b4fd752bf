"""End-to-end wavefront renderer tests: BVH path equals brute-force oracle,
progressive accumulation semantics, checkpoint/resume (SURVEY.md §4 item 4)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from metal_raytracing_tpu.io.image import rmse
from metal_raytracing_tpu.renderer import Renderer, accumulate, make_pixel_offsets
from metal_raytracing_tpu.scenes import plane_sphere_scene
from metal_raytracing_tpu.types import RenderConfig


@pytest.fixture(scope="module")
def small_scene():
    return plane_sphere_scene(48, 48)


def _cfg(**kw):
    base = dict(width=48, height=48, spp=1, max_bounces=2, seed=0,
                ray_block=256)
    base.update(kw)
    return RenderConfig(**base)


def test_bvh_matches_bruteforce_image(small_scene):
    img_ref = Renderer(small_scene, _cfg(tracer="bruteforce")).render(1)
    img_bvh = Renderer(small_scene, _cfg(tracer="bvh")).render(1)
    assert rmse(img_ref, img_bvh) < 1e-6  # identical math, identical hits


def test_image_is_sane(small_scene):
    r = Renderer(small_scene, _cfg(tracer="bvh"))
    img = r.render(2)
    assert img.shape == (48, 48, 3)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0
    assert img.max() > 0.01  # something is lit
    # sphere center pixel should differ from background
    assert r.frame_index == 2
    assert r.total_closest_rays > 0 and r.total_shadow_rays > 0


def test_progressive_accumulation_is_running_mean():
    a = jnp.zeros((2, 2, 3))
    samples = [jnp.full((2, 2, 3), v) for v in (1.0, 2.0, 6.0)]
    for i, s in enumerate(samples):
        a = accumulate(a, s, i)
    np.testing.assert_allclose(np.asarray(a), 3.0, rtol=1e-6)


def test_progressive_matches_average_of_samples(small_scene):
    cfg = _cfg(tracer="bvh")
    r = Renderer(small_scene, cfg)
    img2 = r.render(2)

    # manual: render each sample separately and average
    from metal_raytracing_tpu.renderer import render_sample

    offsets = make_pixel_offsets(cfg)
    s0, _ = render_sample(r.data, r.spec, cfg, offsets, jnp.int32(0))
    s1, _ = render_sample(r.data, r.spec, cfg, offsets, jnp.int32(1))
    manual = (np.asarray(s0) + np.asarray(s1)) / 2.0
    assert rmse(img2, manual) < 1e-6


def test_checkpoint_resume(tmp_path, small_scene):
    cfg = _cfg(tracer="bvh")
    r1 = Renderer(small_scene, cfg)
    r1.render(3)
    path = str(tmp_path / "ckpt.npz")
    r1.save(path)
    r1.render(2)  # 5 samples total

    r2 = Renderer(small_scene, cfg)
    r2.load(path)
    assert r2.frame_index == 3
    r2.render(2)
    assert rmse(r1.image, r2.image) < 1e-7


def test_checkpoint_path_without_npz_extension(tmp_path, small_scene):
    # np.savez appends '.npz' when missing; save/load must both normalize
    # so `--checkpoint ckpt` round-trips (ADVICE.md round 1).
    cfg = _cfg(tracer="bvh")
    r1 = Renderer(small_scene, cfg)
    r1.render(1)
    path = str(tmp_path / "ckpt")  # no extension
    r1.save(path)
    r2 = Renderer(small_scene, cfg)
    r2.load(path)
    assert r2.frame_index == 1
    assert rmse(r1.image, r2.image) < 1e-7


def test_checkpoint_rejects_different_scene(tmp_path, small_scene):
    from metal_raytracing_tpu.scenes import teapot_scene

    cfg = _cfg(tracer="bvh")
    r1 = Renderer(small_scene, cfg)
    r1.render(1)
    path = str(tmp_path / "ckpt.npz")
    r1.save(path)

    other = Renderer(teapot_scene(48, 48), cfg)
    with pytest.raises(ValueError, match="fingerprint"):
        other.load(path)


def test_checkpoint_rejects_different_bounces(tmp_path, small_scene):
    cfg = _cfg(tracer="bvh")
    r1 = Renderer(small_scene, cfg)
    r1.render(1)
    path = str(tmp_path / "ckpt.npz")
    r1.save(path)

    other = Renderer(small_scene, _cfg(tracer="bvh", max_bounces=3))
    with pytest.raises(ValueError, match="fingerprint"):
        other.load(path)


def test_seed_changes_offsets():
    c0 = _cfg(seed=0)
    c1 = _cfg(seed=1)
    o0 = np.asarray(make_pixel_offsets(c0))
    o1 = np.asarray(make_pixel_offsets(c1))
    assert (o0 != o1).any()


def test_env_map_lights_misses():
    scene = plane_sphere_scene(32, 32)
    scene.env_map = np.full((8, 16, 3), 0.5, np.float32)
    cfg = dataclasses.replace(_cfg(width=32, height=32), env_map=True)
    r = Renderer(scene, cfg)
    img = r.render(1)
    # row H-1 has uv_y ~ +1 (camera-up): misses all geometry -> pure env
    assert img[-1].max() == pytest.approx(0.5, rel=1e-5)
    assert img[-1].min() == pytest.approx(0.5, rel=1e-5)
    # row 0 points down: hits the 0.5-albedo plane, whose bounce ray sees the
    # env -> secondary env contribution 0.5 * 0.5 shows up
    assert img[0].max() >= 0.25 - 1e-5


def test_more_bounces_add_energy(small_scene):
    img1 = Renderer(small_scene, _cfg(max_bounces=1)).render(1)
    img3 = Renderer(small_scene, _cfg(max_bounces=3)).render(1)
    assert img3.sum() > img1.sum()


def test_specular_extension_runs(small_scene):
    from metal_raytracing_tpu.scenes import coatball_scene

    scene = coatball_scene(32, 24)
    cfg = RenderConfig(width=32, height=24, max_bounces=2, tracer="bvh",
                       ray_block=128, enable_specular=True,
                       enable_emission=True)
    img = Renderer(scene, cfg).render(1)
    assert np.isfinite(img).all() and img.max() > 0.0


def test_materials_deduplicated_across_instances():
    from metal_raytracing_tpu.io import procedural
    from metal_raytracing_tpu.scene import Scene, flatten_instances

    scene = Scene(32, 32)
    model = procedural.make_model("sphere")
    scene.add_instance(model, position=(0, 0, 0))
    scene.add_instance(model, position=(2, 0, 0))  # same materials
    *_, mids, materials, _uvc = flatten_instances(scene.instances)
    n_unique = len({s.material for s in model.submeshes})
    assert len(materials) == n_unique  # not 2x
    assert mids.max() == len(materials) - 1


def test_compaction_matches_uncompacted(small_scene):
    img_on = Renderer(small_scene, _cfg(compaction=True)).render(1)
    img_off = Renderer(small_scene, _cfg(compaction=False)).render(1)
    assert rmse(img_on, img_off) < 1e-7


def test_sort_last_bounce_skip_is_pure_permutation(small_scene):
    """Skipping the final bounce's compaction sort (sort_last_bounce=False)
    only changes traversal ORDER — per-ray radiance returns to its pixel
    through the carried ``cur`` slot either way.  Tolerance, not exact
    zero: a t TIE between coincident triangles can resolve to a different
    (identically placed) winner depending on block composition, same
    caveat as the sort-key cross tests (ADVICE round 2 #4)."""
    img_on = Renderer(small_scene, _cfg(max_bounces=3,
                                        sort_last_bounce=True)).render(2)
    img_off = Renderer(small_scene, _cfg(max_bounces=3,
                                         sort_last_bounce=False)).render(2)
    assert rmse(img_on, img_off) < 1e-7


def test_sort_pack_f16_stays_inside_pixel_budget(small_scene):
    """The packed-f16 sort payload (RenderConfig.sort_pack_f16) rounds
    throughput/radiance to f16 once per bounce sort — the image must stay
    far inside the 1e-3 parity budget, and the pack/unpack round-trip
    must actually engage (identical would mean the knob is dead code)."""
    ref = Renderer(small_scene, _cfg(max_bounces=3)).render(2)
    img = Renderer(small_scene, _cfg(max_bounces=3,
                                     sort_pack_f16=True)).render(2)
    err = rmse(ref, img)
    assert err < 3e-4
    assert err > 0.0  # the rounding is real


def test_shadow_sort_is_pure_permutation(small_scene):
    """The (light, hit-point Morton) shadow re-sort (RenderConfig.shadow_sort)
    reorders occlusion queries only — the image must be bit-identical."""
    img_on = Renderer(small_scene, _cfg(max_bounces=3,
                                        shadow_sort=True)).render(2)
    img_off = Renderer(small_scene, _cfg(max_bounces=3,
                                         shadow_sort=False)).render(2)
    assert rmse(img_on, img_off) == 0.0


@pytest.mark.parametrize("key", ["dir_major", "hybrid", "dir6", "dir9"])
def test_sort_keys_are_pure_permutations(small_scene, key):
    """Every bounce sort-key layout reorders traversal blocks only — the
    image must match across keys (per-ray results are independent of
    block membership).  Tolerance, not exact zero: on the pallas tracer a
    512-ulp t TIE between coincident triangles can in principle resolve
    to a different (identically shaded, but distinct) winner depending on
    block composition (ADVICE round 2 #4); on exact tracers the images
    are in fact bit-identical."""
    ref = Renderer(small_scene, _cfg(max_bounces=3,
                                     sort_key="dir_major")).render(1)
    img = Renderer(small_scene, _cfg(max_bounces=3, sort_key=key)).render(1)
    assert rmse(ref, img) < 1e-7


def test_shadow_sort_many_lights_no_leak():
    """Regression: the shadow-sort key packs the light index above the
    Morton bits sized to the STATIC light count — a fixed <<27 shift
    collided with the 2**30 dead-ray sentinel at >= 8 lights, silently
    dropping those lights' shadows (treated as unoccluded)."""
    import numpy as np

    from metal_raytracing_tpu.scenes import plane_sphere_scene
    from metal_raytracing_tpu.types import area_light

    def scene_with_lights():
        s = plane_sphere_scene(48, 48)
        # add 8 more area lights around the ceiling: 10 total, indices > 7
        for i in range(8):
            a = 2.0 * np.pi * i / 8.0
            s.lights.append(area_light(
                position=(1.5 * np.cos(a), 1.9, 1.5 * np.sin(a)),
                forward=(0.0, -1.0, 0.0), right=(0.1, 0.0, 0.0),
                up=(0.0, 0.0, 0.1), color=(2.0, 2.0, 2.0)))
        return s

    on = Renderer(scene_with_lights(),
                  _cfg(max_bounces=2, shadow_sort=True)).render(2)
    off = Renderer(scene_with_lights(),
                   _cfg(max_bounces=2, shadow_sort=False)).render(2)
    assert rmse(on, off) == 0.0


def test_reset_restarts_accumulation(small_scene):
    """Renderer.reset() is the resize/accumulation-restart analog
    (reference Renderer.swift:353-355): after reset, rendering again must
    reproduce a fresh render exactly."""
    r = Renderer(small_scene, _cfg())
    fresh = r.render(2)
    r.reset()
    again = r.render(2)
    assert r.frame_index == 2
    assert rmse(fresh, again) == 0.0


def test_samples_per_dispatch_bit_identical(small_scene):
    """k samples per dispatch (RenderConfig.samples_per_dispatch) is the
    SAME sequential accumulate fold inside one program: the image must be
    bit-identical to per-sample dispatches, total_samples must advance by
    exactly the requested spp (no overshoot — the round-4 CLI bug), and a
    non-multiple spp must take an exact remainder step."""
    r1 = Renderer(small_scene, _cfg(tracer="bvh", samples_per_dispatch=1))
    r4 = Renderer(small_scene, _cfg(tracer="bvh", samples_per_dispatch=4))
    img1 = r1.render(5)
    img4 = r4.render(5)  # 4 + exact remainder 1
    np.testing.assert_array_equal(img1, img4)
    assert r1.total_samples == 5
    assert r4.total_samples == 5
    # counters agree too (same rays traced either way)
    assert r1.total_closest_rays == r4.total_closest_rays
    assert r1.total_shadow_rays == r4.total_shadow_rays


def test_auto_samples_per_dispatch_tiers(small_scene):
    """samples_per_dispatch=0 resolves by scene size: 8 for <= 256^2,
    4 for <= 512^2, 2 beyond (measured tiers, BASELINE.md batch
    r4-6/r4-7) — the CLI's save-every stepping depends on the resolved
    value, so the tiers are locked here."""
    import dataclasses

    for side, want in ((128, 8), (256, 8), (400, 4), (512, 4),
                       (600, 2), (1024, 2)):
        cfg = dataclasses.replace(_cfg(tracer="bvh"), width=side,
                                  height=side, samples_per_dispatch=0)
        assert Renderer(small_scene, cfg).samples_per_dispatch == want, side
    # explicit values pass through untouched
    cfg = dataclasses.replace(_cfg(tracer="bvh"), samples_per_dispatch=3)
    assert Renderer(small_scene, cfg).samples_per_dispatch == 3
