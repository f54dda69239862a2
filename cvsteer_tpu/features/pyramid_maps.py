"""Batched steerable map pyramids: G2/H2 + G4/H4 over Gaussian levels.

BASELINE config 2 as a direct API: every pyramid level's full set of
orientation-energy and phase maps from both quadrature pairs, batched over
images. Feature extraction (keypoints + descriptors) builds on the G2 maps
via features.frontend; this module exposes the raw map stack for consumers
that want the dense fields (flow, segmentation, texture analysis).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax

from cvsteer_tpu.filters import g2 as fg2
from cvsteer_tpu.filters import g4 as fg4
from cvsteer_tpu.ops.pyramid import gaussian_pyramid


class LevelMaps(NamedTuple):
    """Per-level dense map stack (shapes [..., H_l, W_l])."""

    g2: fg2.G2Maps
    g4: Optional[fg4.G4Maps]


def steerable_pyramid_maps(
    image: jax.Array,
    *,
    levels: int = 5,
    with_g4: bool = True,
    g2_bank: Optional[fg2.G2Bank] = None,
    g4_bank: Optional[fg4.G4Bank] = None,
    method: str = "auto",
) -> Tuple[LevelMaps, ...]:
    """All steerable maps of ``image [..., H, W]`` at every pyramid level."""
    if g2_bank is None:
        g2_bank = fg2.g2_bank()
    if with_g4 and g4_bank is None:
        g4_bank = fg4.g4_bank()

    out = []
    for img in gaussian_pyramid(image, levels):
        g2_maps = fg2.steerable_pipeline_g2(img, g2_bank, method=method)
        g4_maps = (
            fg4.steerable_pipeline_g4(img, g4_bank) if with_g4 else None
        )
        out.append(LevelMaps(g2=g2_maps, g4=g4_maps))
    return tuple(out)
