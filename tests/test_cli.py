"""CLI progressive-dispatch arithmetic (no rendering).

The render loop batches ``samples_per_dispatch`` samples per jitted
dispatch (reference analog: one sample per vsync frame,
Renderer.swift:284); the span must hit every --save-every boundary and
finish exactly at --spp.
"""

from metal_raytracing_tpu.cli import dispatch_span


def _simulate(spd, spp, save_every):
    """Run the render loop's stepping arithmetic; return (frames, saves)."""
    frame, frames, saves = 0, [], []
    while frame < spp:
        k = dispatch_span(frame, spd, spp, save_every)
        assert k >= 1, "loop must always make progress"
        frame += k
        frames.append(frame)
        if save_every and frame % save_every == 0:
            saves.append(frame)
    return frames, saves


def test_exact_spp_no_overshoot():
    for spd in (1, 3, 4, 7):
        for spp in (1, 2, 5, 8, 64):
            frames, _ = _simulate(spd, spp, None)
            assert frames[-1] == spp


def test_save_every_boundaries_all_hit():
    # spd=4 with save_every=2 previously strode past odd boundaries and
    # never saved (round-4 review finding)
    frames, saves = _simulate(4, 8, 2)
    assert saves == [2, 4, 6, 8]
    # misaligned save interval vs batch
    frames, saves = _simulate(4, 10, 3)
    assert saves == [3, 6, 9]
    assert frames[-1] == 10


def test_save_every_larger_than_batch():
    _, saves = _simulate(2, 12, 5)
    assert saves == [5, 10]


def test_save_every_disabled_uses_full_batches():
    frames, _ = _simulate(4, 12, None)
    assert frames == [4, 8, 12]
