"""cvsteer_tpu — a TPU-native steerable-filter vision framework + SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``headupinclouds/cvsteer`` (Freeman & Adelson separable steerable filters:
the G2 second-derivative-of-Gaussian quadrature pair G2/H2 and the G4/H4
extension), widened into a batched image-pyramid front-end with keypoints,
phase descriptors, two-view geometry, windowed Schur-complement bundle
adjustment and multi-host pose-graph optimization.

Layout
------
- :mod:`cvsteer_tpu.filters`   — steerable filter banks (G2/H2, G4/H4), steering,
  oriented energy, phase analysis, edge/line extraction.
- :mod:`cvsteer_tpu.ops`       — TPU compute primitives: separable convolution
  (XLA + fused Pallas kernels), pyramids, NMS.
- :mod:`cvsteer_tpu.features`  — keypoints, phase descriptors, matching.
- :mod:`cvsteer_tpu.geometry`  — epipolar geometry, RANSAC, pose.
- :mod:`cvsteer_tpu.slam`      — VO, bundle adjustment, pose graph.
- :mod:`cvsteer_tpu.parallel`  — device meshes, sharding, halo exchange,
  distributed BA collectives.
- :mod:`cvsteer_tpu.io`        — image IO (native C++ PNG/JPEG codecs + fallbacks).
- :mod:`cvsteer_tpu.utils`     — config, logging, metrics, profiling, checkpoints.

The public functional API mirrors the reference's capabilities
(``cvsteer/SteerableFiltersG2.h``, ``SteerableFiltersG4.h``) but is batched,
functional and jit/vmap/pjit-composable rather than class-per-image.
"""

__version__ = "0.1.0"

from cvsteer_tpu.filters import (  # noqa: F401
    G2Bank,
    G4Bank,
    g2_bank,
    g4_bank,
    steerable_pipeline_g2,
    steerable_pipeline_g4,
)
