"""Multi-chip scaling via jax.sharding (SURVEY.md §2e / §5)."""

from .sharding import (  # noqa: F401
    ShardedRenderer,
    make_mesh,
    render_sample_spp_sharded,
    render_sample_tile_sharded,
)
