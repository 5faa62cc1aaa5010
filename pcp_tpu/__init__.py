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

import os as _os

# persistent XLA compilation cache: full-grid model compiles take minutes;
# cached reruns are near-instant
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
try:  # configure eagerly in case jax was already imported
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir", _os.environ["JAX_COMPILATION_CACHE_DIR"])
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # pragma: no cover - cache is an optimization only
    pass

from .config import cfg, cfg_from_yaml_file, cfg_from_list, CfgDict
