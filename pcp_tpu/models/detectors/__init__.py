from .centerpoint import CenterPoint
from .detector_template import Detector3DTemplate, DatasetInfo

__all__ = {
    "CenterPoint": CenterPoint,
}


def build_detector(model_cfg, num_class, dataset_info):
    try:
        cls = __all__[model_cfg["NAME"]]
    except KeyError:
        raise NotImplementedError(f"detector {model_cfg['NAME']!r} not implemented")
    return cls(model_cfg=model_cfg, num_class=num_class, dataset_info=dataset_info)
