"""Anchor-pinning discipline (VERDICT round 4 weak #3 / task 3).

The bench's same-process anchor only turns ±5% tunnel variance into a
provable headline_over_anchor delta if EVERY perf-relevant RenderConfig
knob is pinned at its round-3 value the commit it lands — round 4's first
close run leaked the new ``shadow_hit_key_from`` default into the anchor
and mis-measured itself.  These tests enforce the partition:

    RenderConfig fields == _ANCHOR_OVERRIDES (pinned) ⊎ _ANCHOR_NEUTRAL

so adding a config field without classifying it fails CI immediately.
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root module)
from metal_raytracing_tpu.types import RenderConfig  # noqa: E402


def test_every_config_field_is_pinned_or_declared_neutral():
    fields = {f.name for f in dataclasses.fields(RenderConfig)}
    pinned = set(bench._ANCHOR_OVERRIDES)
    neutral = set(bench._ANCHOR_NEUTRAL)
    unclassified = fields - pinned - neutral
    assert not unclassified, (
        f"RenderConfig fields {sorted(unclassified)} are neither pinned in "
        f"bench._ANCHOR_OVERRIDES (at their round-3-equivalent value) nor "
        f"declared image-semantics-only in bench._ANCHOR_NEUTRAL — an "
        f"unpinned perf knob silently changes the anchor (round-4 leak)")


def test_no_field_is_both_pinned_and_neutral():
    both = set(bench._ANCHOR_OVERRIDES) & set(bench._ANCHOR_NEUTRAL)
    assert not both, f"ambiguous anchor classification: {sorted(both)}"


def test_anchor_overrides_reference_only_real_fields_or_future_knobs():
    # _anchor_config drops pins for fields this build predates; a pin whose
    # field NEVER lands would linger silently — flag pins that don't exist
    # yet so they are either implemented or removed.
    fields = {f.name for f in dataclasses.fields(RenderConfig)}
    dangling = set(bench._ANCHOR_OVERRIDES) - fields
    assert not dangling, (
        f"bench._ANCHOR_OVERRIDES pins unknown RenderConfig fields "
        f"{sorted(dangling)} (typo, or the knob was removed)")


def test_anchor_config_constructs():
    cfg = bench._anchor_config(64, 64, RenderConfig)
    assert cfg.sort_key == "cluster2"
    assert cfg.samples_per_dispatch == 1
    assert cfg.shadow_hit_key_from == 99  # the round-4 leak, pinned off
