"""Headless CLI — the framework's app shell.

Replaces the reference's Cocoa/MTKView presentation layer
(reference: AppDelegate.swift:10-27, GameViewController.swift:17-43,
Renderer.swift:284-351): instead of a vsync-driven progressive window, a
progressive render loop with periodic PNG/HDR snapshots and resumable
checkpoints.

Usage:
    python -m metal_raytracing_tpu render --scene dragon --size 512x512 \
        --spp 16 --out dragon.png
    python -m metal_raytracing_tpu scenes
"""

from __future__ import annotations

import argparse
import sys
import time

from .io import image as image_io
from .renderer import Renderer
from .scenes import SCENES, get_scene
from .types import RenderConfig


def _parse_size(s: str):
    w, _, h = s.partition("x")
    return int(w), int(h or w)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="metal_raytracing_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    r = sub.add_parser("render", help="render a scene to an image")
    r.add_argument("--scene", default="dragon", choices=sorted(SCENES))
    r.add_argument("--size", type=_parse_size, default=(512, 512),
                   metavar="WxH")
    r.add_argument("--spp", type=int, default=4, help="samples per pixel")
    r.add_argument("--bounces", type=int, default=3,
                   help="path depth (reference hardcodes 3)")
    r.add_argument("--tracer", default="auto",
                   choices=("auto", "bvh", "bruteforce", "pallas"))
    r.add_argument("--seed", type=int, default=0)
    r.add_argument("--out", default="render.png")
    r.add_argument("--hdr-out", default=None,
                   help="also write linear HDR output")
    r.add_argument("--no-tonemap", action="store_true")
    r.add_argument("--env-map", action="store_true",
                   help="enable HDR environment lighting on miss")
    r.add_argument("--specular", action="store_true",
                   help="enable specular (Ks/Ns) reflection lobes")
    r.add_argument("--emission", action="store_true",
                   help="enable emissive (Ke) materials")
    r.add_argument("--textures", action="store_true",
                   help="enable UV-mapped base-color textures (map_Kd)")
    r.add_argument("--refraction", action="store_true",
                   help="enable dielectric refraction (Ni/d materials)")
    r.add_argument("--texture-filter", default="nearest",
                   choices=("nearest", "bilinear"),
                   help="texture sampling filter (with --textures)")
    r.add_argument("--bvh-builder",
                   default=RenderConfig.bvh_builder,
                   choices=["sah", "sah_free", "sah_chunk", "median",
                            "morton", "ploc"],
                   help="leaf clustering strategy (see RenderConfig; "
                        "default follows the adopted RenderConfig "
                        "default)")
    r.add_argument("--no-compaction", action="store_true",
                   help="disable live-ray compaction between bounces")
    r.add_argument("--feedback", type=int, default=0, metavar="N",
                   help="after N samples, rebuild the BVH to the "
                        "MEASURED ray distribution (Renderer.refine, "
                        "sah_rays builder) and continue; image-identical")
    r.add_argument("--checkpoint", default=None,
                   help="checkpoint path for save/resume")
    r.add_argument("--resume", action="store_true",
                   help="resume from --checkpoint if it exists")
    r.add_argument("--save-every", type=int, default=0,
                   help="write the image every N samples")
    r.add_argument("--quiet", action="store_true")

    sub.add_parser("scenes", help="list available scenes")

    pa = sub.add_parser(
        "parity",
        help="render on the accelerator and on CPU; report RMSE "
             "(BASELINE: < 1e-3)")
    pa.add_argument("--scene", default="plane_sphere", choices=sorted(SCENES))
    pa.add_argument("--size", type=_parse_size, default=(64, 64),
                    metavar="WxH")
    pa.add_argument("--spp", type=int, default=1)
    pa.add_argument("--bounces", type=int, default=3)
    pa.add_argument("--seed", type=int, default=0)
    return p


def dispatch_span(frame_index: int, samples_per_dispatch: int,
                  spp: int, save_every: int | None) -> int:
    """Samples for the next progressive dispatch from ``frame_index``.

    The batch (``samples_per_dispatch``, auto 4 on small scenes) must not
    overshoot the requested ``spp`` — total_samples/checkpoint semantics
    count exact samples — and must LAND on every ``--save-every``
    boundary, not stride past it (a spd-4 render with --save-every 2
    would otherwise never save)."""
    k = min(samples_per_dispatch, spp - frame_index)
    if save_every:
        k = min(k, save_every - frame_index % save_every)
    return k


def cmd_parity(args) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .io.image import rmse
    from .renderer import accumulate, make_pixel_offsets, render_sample

    width, height = args.size
    scene = get_scene(args.scene, width, height)
    # The jnp packet tracer runs compiled on every backend (the pallas path
    # would need interpret mode on CPU); it is bit-exact vs pallas anyway.
    cfg = RenderConfig(width=width, height=height, max_bounces=args.bounces,
                       seed=args.seed, tracer="bvh",
                       env_map=scene.env_map is not None)
    data, spec = scene.build(cluster_size=cfg.cluster_size)
    offsets = make_pixel_offsets(cfg)

    images = {}
    devices = {"accel": jax.devices()[0]}
    cpus = jax.devices("cpu") if jax.default_backend() != "cpu" else []
    if cpus:
        devices["cpu"] = cpus[0]
    for name, dev in devices.items():
        d = jax.device_put(data, dev)
        o = jax.device_put(offsets, dev)
        acc = jnp.zeros((height, width, 3), device=dev)
        with jax.default_device(dev):
            step = jax.jit(lambda dd, oo, fi: render_sample(
                dd, spec, cfg, oo, fi))
            for k in range(args.spp):
                sample, _ = step(d, o, jnp.int32(k))
                acc = accumulate(acc, sample, k)
        images[name] = np.asarray(jax.device_get(acc))

    if len(images) < 2:
        print(f"single backend ({jax.default_backend()}); nothing to compare")
        return 0
    err = rmse(images["accel"], images["cpu"])
    ok = err < 1e-3
    print(f"scene={args.scene} {width}x{height} spp={args.spp} "
          f"RMSE={err:.3e} -> {'PASS' if ok else 'FAIL'} (target < 1e-3)")
    return 0 if ok else 1


def cmd_render(args) -> int:
    width, height = args.size
    scene = get_scene(args.scene, width, height)
    cfg = RenderConfig(
        width=width, height=height, spp=args.spp, max_bounces=args.bounces,
        seed=args.seed, tracer=args.tracer,
        env_map=args.env_map or scene.env_map is not None,
        enable_specular=args.specular or scene.name == "coatball",
        enable_emission=args.emission,
        enable_textures=args.textures or scene.name == "uv_test",
        texture_filter=args.texture_filter,
        enable_refraction=args.refraction or scene.name == "glass_sphere",
        bvh_builder=args.bvh_builder,
        compaction=not args.no_compaction)

    t0 = time.perf_counter()
    renderer = Renderer(scene, cfg)
    build_s = time.perf_counter() - t0
    if not args.quiet:
        print(f"scene {scene.name}: {scene.triangle_count} triangles, "
              f"{renderer.spec.bvh.num_clusters} clusters, "
              f"build {build_s:.2f}s", file=sys.stderr)

    if args.resume and args.checkpoint:
        import os

        if os.path.exists(Renderer.checkpoint_path(args.checkpoint)):
            renderer.load(args.checkpoint)
            if not args.quiet:
                print(f"resumed at sample {renderer.frame_index}",
                      file=sys.stderr)

    # Progress prints fetch the device ray counters (a host sync), so they
    # are rate-limited to keep the step loop async-dispatched between them.
    progress_every = max(1, args.spp // 16)
    t0 = time.perf_counter()
    feedback_at = args.feedback if args.feedback > 0 else None
    while renderer.frame_index < args.spp:
        k = dispatch_span(renderer.frame_index,
                          renderer.samples_per_dispatch,
                          args.spp, args.save_every)
        if feedback_at and renderer.frame_index < feedback_at:
            k = min(k, feedback_at - renderer.frame_index)
        renderer.step(k)
        if feedback_at and renderer.frame_index >= feedback_at:
            feedback_at = None
            ok = renderer.refine()
            if not args.quiet:
                print(f"\nfeedback rebuild at sample {renderer.frame_index}"
                      f": {'ok, ' + str(renderer.spec.bvh.num_clusters) + ' clusters' if ok else 'no sample (skipped)'}",
                      file=sys.stderr)
        if args.save_every and renderer.frame_index % args.save_every == 0:
            image_io.write_png(args.out, renderer.image,
                               tonemap=not args.no_tonemap)
            if args.checkpoint:
                renderer.save(args.checkpoint)
        if not args.quiet and (renderer.frame_index % progress_every == 0
                               or renderer.frame_index == args.spp):
            el = time.perf_counter() - t0
            rays = renderer.total_closest_rays + renderer.total_shadow_rays
            print(f"\rsample {renderer.frame_index}/{args.spp}  "
                  f"{el:.1f}s  {rays / max(el, 1e-9) / 1e6:.1f} Mrays/s",
                  end="", file=sys.stderr)
    if not args.quiet:
        print(file=sys.stderr)

    image_io.write_png(args.out, renderer.image, tonemap=not args.no_tonemap)
    if args.hdr_out:
        image_io.write_hdr(args.hdr_out, renderer.image)
    if args.checkpoint:
        renderer.save(args.checkpoint)
    if not args.quiet:
        print(f"wrote {args.out}", file=sys.stderr)
    return 0


def cmd_scenes(_args) -> int:
    for name in sorted(SCENES):
        print(name)
    return 0


def main(argv=None) -> int:
    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    if args.command == "render":
        return cmd_render(args)
    if args.command == "scenes":
        return cmd_scenes(args)
    if args.command == "parity":
        return cmd_parity(args)
    return 1


if __name__ == "__main__":
    sys.exit(main())
