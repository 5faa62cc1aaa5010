"""Model registry + builder (counterpart of reference pcdet/models/__init__.py
``build_network``). Detector classes are flax Modules; ``build_network``
returns an *unbound* module — initialize with ``module.init(rng, batch)`` and
run with ``module.apply(vars, batch, train=...)``.
"""
from .detectors import build_detector
from .detectors.detector_template import DatasetInfo


def build_network(model_cfg, num_class, dataset_info: DatasetInfo):
    return build_detector(model_cfg, num_class, dataset_info)
