"""Two-view reconstruction: images in, relative pose + sparse points out.

BASELINE config 3 as one call: steerable features -> descriptor matching ->
essential RANSAC -> cheirality-voted pose -> triangulation. The device work
(features, matching, RANSAC, pose) is jit-compiled; only the thin result
assembly runs on host.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from cvsteer_tpu.features.frontend import Features, FrontendConfig, extract_features
from cvsteer_tpu.features.matching import match_descriptors
from cvsteer_tpu.geometry.camera import Intrinsics, normalize_pixels
from cvsteer_tpu.geometry.epipolar import RansacResult, ransac_essential
from cvsteer_tpu.geometry.pose import TwoViewPose, recover_pose
from cvsteer_tpu.utils.precision import precise


class TwoViewResult(NamedTuple):
    """R/t: camera-a -> camera-b (||t||=1); points in camera-a frame."""

    R: jax.Array
    t: jax.Array
    points: jax.Array  # [N, 3] triangulated matches (camera-a frame)
    point_valid: jax.Array  # [N] inlier & cheirality mask
    num_matches: jax.Array
    num_inliers: jax.Array
    E: jax.Array


@precise
def two_view_pose(
    image_a: jax.Array,
    image_b: jax.Array,
    intrinsics: Intrinsics,
    *,
    cfg: FrontendConfig = FrontendConfig(),
    match_ratio: float = 0.85,
    ransac_hypotheses: int = 512,
    ransac_threshold_px: float = 1.5,
    key: Optional[jax.Array] = None,
) -> TwoViewResult:
    """Relative pose between two grayscale images ``[H, W]``.

    ``ransac_threshold_px``: Sampson inlier bound in pixels (converted to
    normalized units with the focal length — a fixed normalized threshold
    silently changes meaning across cameras)."""
    fa = extract_features(image_a, cfg=cfg)
    fb = extract_features(image_b, cfg=cfg)
    return two_view_pose_from_features(
        fa,
        fb,
        intrinsics,
        match_ratio=match_ratio,
        ransac_hypotheses=ransac_hypotheses,
        ransac_threshold_px=ransac_threshold_px,
        key=key,
    )


@precise
def two_view_pose_from_features(
    fa: Features,
    fb: Features,
    intrinsics: Intrinsics,
    *,
    match_ratio: float = 0.85,
    ransac_hypotheses: int = 512,
    ransac_threshold_px: float = 1.5,
    key: Optional[jax.Array] = None,
) -> TwoViewResult:
    if key is None:
        key = jax.random.key(0)
    f_mean = 0.5 * (intrinsics.fx + intrinsics.fy)
    ransac_threshold = (ransac_threshold_px / f_mean) ** 2
    m = match_descriptors(fa.desc, fa.valid, fb.desc, fb.valid, ratio=match_ratio)
    xa = normalize_pixels(fa.yx, intrinsics)
    xb_all = normalize_pixels(fb.yx, intrinsics)
    xb = xb_all[jnp.maximum(m.index, 0)]

    res: RansacResult = ransac_essential(
        xa,
        xb,
        m.valid,
        key,
        num_hypotheses=ransac_hypotheses,
        inlier_threshold=ransac_threshold,
    )
    pose: TwoViewPose = recover_pose(res.E, xa, xb, res.inliers)
    return TwoViewResult(
        R=pose.R,
        t=pose.t,
        points=pose.points,
        point_valid=pose.cheirality & res.inliers,
        num_matches=m.count,
        num_inliers=res.num_inliers,
        E=res.E,
    )
