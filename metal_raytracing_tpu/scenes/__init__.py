"""Scene library: the reference's scene zoo plus the BASELINE config ladder."""

from .library import (  # noqa: F401
    SCENES,
    coatball_scene,
    dragon_scene,
    get_scene,
    plane_sphere_scene,
    bunny_env_scene,
    glass_sphere_scene,
    teapot_scene,
    uv_test_scene,
)
