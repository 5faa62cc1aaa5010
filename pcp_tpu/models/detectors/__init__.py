from .centerpoint import CenterPoint
from .detector_template import Detector3DTemplate, DatasetInfo
from .pointpillar import PointPillar, SECONDNet
from .pointrcnn import PointRCNN
from .pvrcnn import PVRCNN
from .v2x_late_fusion import V2XLateFusion

__all__ = {
    "CenterPoint": CenterPoint,
    "PointPillar": PointPillar,
    "PointRCNN": PointRCNN,
    "PVRCNN": PVRCNN,
    "SECONDNet": SECONDNet,
    "V2XLateFusion": V2XLateFusion,
}


def build_detector(model_cfg, num_class, dataset_info):
    try:
        cls = __all__[model_cfg["NAME"]]
    except KeyError:
        raise NotImplementedError(f"detector {model_cfg['NAME']!r} not implemented")
    return cls(model_cfg=model_cfg, num_class=num_class, dataset_info=dataset_info)
