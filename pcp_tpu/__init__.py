"""pcp_tpu — Practical Collaborative Perception, TPU-native.

A JAX/XLA/Pallas re-design of the V2X collaborative 3D object detection
framework from "Practical Collaborative Perception" (arXiv:2307.01462),
with the capabilities of the OpenPCDet-based reference implementation:
single-agent PointPillars/CenterPoint detection, late/early/mid (DiscoNet)
fusion baselines, and MoDAR-based "lately" fusion with scene-flow async
compensation — built for TPU from the ground up (static shapes, pjit/mesh
data parallelism, Pallas kernels on the hot scatter paths).
"""

__version__ = "0.1.0"

from .config import cfg, cfg_from_yaml_file, cfg_from_list, CfgDict
