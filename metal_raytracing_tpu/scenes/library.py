"""Concrete scenes: the DragonScene of the reference plus the BASELINE.json
config ladder (plane+sphere, teapot, bunny+HDR, dragon, coatball)."""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

from ..assets import resolve_env_map, resolve_model
from ..scene import Scene
from ..types import area_light, spot_light, sun_light

__all__ = [
    "dragon_scene", "plane_sphere_scene", "teapot_scene", "bunny_env_scene",
    "coatball_scene", "SCENES", "get_scene",
]


def _fit(model, target: float):
    """Uniform scale factor that fits a model's largest extent to ``target``."""
    lo = model.positions.min(axis=0)
    hi = model.positions.max(axis=0)
    extent = float((hi - lo).max())
    return target / max(extent, 1e-9), lo, hi


def dragon_scene(width: int = 1024, height: int = 1024) -> Scene:
    """The reference's showcase scene: 7 instances with the default area +
    spot lights (reference: DragonScene.swift:11-33, Scene.swift:18-34)."""
    s = Scene(width, height)
    s.name = "dragon"
    s.add_instance(resolve_model("train"), position=(-0.3, 0.0, 0.4), scale=0.5)
    s.add_instance(resolve_model("dragon"), position=(0.3, 0.38, 2.5),
                   rotation=(0.0, np.pi / 2 * 1.2, 0.0), scale=1.2)
    s.add_instance(resolve_model("treefir"), position=(0.5, 0.0, -0.2), scale=0.7)
    s.add_instance(resolve_model("plane"), position=(0.0, 0.0, 0.0), scale=10.0)
    s.add_instance(resolve_model("sphere"), position=(-1.9, 0.0, 0.3), scale=1.0)
    s.add_instance(resolve_model("sphere"), position=(2.9, 0.0, -0.5), scale=2.0)
    s.add_instance(resolve_model("plane-back"), position=(0.0, 0.0, -1.5), scale=10.0)
    return s


def plane_sphere_scene(width: int = 256, height: int = 256) -> Scene:
    """BASELINE configs[0]: plane + sphere, one area light."""
    s = Scene(width, height, default_lights=False)
    s.name = "plane_sphere"
    # Light placed well above the sphere (radius 1 at y=1) so the scene is
    # actually lit: at the sphere top the falloff is 1/4 -> radiance ~2.5.
    s.lights = [area_light(position=(0.0, 4.0, 1.0), forward=(0.0, -1.0, 0.0),
                           right=(0.5, 0.0, 0.0), up=(0.0, 0.0, 0.5),
                           color=(10.0, 10.0, 10.0))]
    s.add_instance(resolve_model("plane"), position=(0.0, 0.0, 0.0), scale=10.0)
    s.add_instance(resolve_model("sphere"), position=(0.0, 1.0, 1.0), scale=1.0)
    return s


def teapot_scene(width: int = 512, height: int = 512) -> Scene:
    """BASELINE configs[1]: diffuse teapot, area + sun lights, shadows.

    The sun parameters reuse the reference's (commented-out) construction
    ``Light.sunLight(direction: [-1, -2, 0], color: [1,1,1])``
    (reference: Scene.swift:28)."""
    s = Scene(width, height, default_lights=False)
    s.name = "teapot"
    s.lights = [
        area_light(position=(0.0, 1.98, 0.0), forward=(0.0, -1.0, 0.0),
                   right=(0.25, 0.0, 0.0), up=(0.0, 0.0, 0.25),
                   color=(4.0, 4.0, 4.0)),
        sun_light(direction=(-1.0, -2.0, 0.0), color=(1.0, 1.0, 1.0)),
    ]
    teapot = resolve_model("teapot")
    scale, lo, _ = _fit(teapot, 2.0)
    s.add_instance(teapot, position=(0.0, -float(lo[1]) * scale, 0.5),
                   scale=scale)
    s.add_instance(resolve_model("plane"), position=(0.0, 0.0, 0.0), scale=10.0)
    return s


def bunny_env_scene(width: int = 512, height: int = 512) -> Scene:
    """BASELINE configs[2]: bunny with a spotlight + HDR environment map."""
    s = Scene(width, height, default_lights=False)
    s.name = "bunny_env"
    s.lights = [spot_light(position=(2.0, 1.0, 4.0),
                           direction=(-1.5, -0.5, -1.5),
                           cone_angle=25.0 / 180.0 * np.pi,
                           color=(4.0, 4.0, 4.0))]
    bunny = resolve_model("bunny")
    scale, lo, _ = _fit(bunny, 1.4)
    s.add_instance(bunny, position=(0.0, -float(lo[1]) * scale, 1.0),
                   scale=scale)
    s.add_instance(resolve_model("plane"), position=(0.0, 0.0, 0.0), scale=10.0)
    s.env_map = resolve_env_map("vulture_hide_4k")
    return s


def coatball_scene(width: int = 1024, height: int = 768) -> Scene:
    """BASELINE configs[4]: specular/metallic material test ball."""
    s = Scene(width, height)
    s.name = "coatball"
    coatball = resolve_model("coatball")
    scale, lo, _ = _fit(coatball, 1.6)
    s.add_instance(coatball, position=(0.0, -float(lo[1]) * scale, 1.5),
                   scale=scale)
    s.add_instance(resolve_model("plane"), position=(0.0, 0.0, 0.0), scale=10.0)
    s.add_instance(resolve_model("plane-back"), position=(0.0, 0.0, -1.5),
                   scale=10.0)
    return s


SCENES: Dict[str, Callable[..., Scene]] = {
    "dragon": dragon_scene,
    "plane_sphere": plane_sphere_scene,
    "teapot": teapot_scene,
    "bunny_env": bunny_env_scene,
    "coatball": coatball_scene,
}


def get_scene(name: str, width: int = None, height: int = None) -> Scene:
    try:
        fn = SCENES[name]
    except KeyError:
        raise KeyError(f"unknown scene {name!r}; available: {sorted(SCENES)}")
    kwargs = {}
    if width is not None:
        kwargs["width"] = width
    if height is not None:
        kwargs["height"] = height
    return fn(**kwargs)
