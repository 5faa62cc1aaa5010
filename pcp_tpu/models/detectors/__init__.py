from .caddn import CaDDN
from .centerpoint import CenterPoint
from .mppnet import MPPNet, MPPNetE2E
from .parta2_net import PartA2Net
from .pillarnet import PillarNet
from .detector_template import Detector3DTemplate, DatasetInfo
from .pointpillar import PointPillar, SECONDNet
from .pointrcnn import PointRCNN
from .pvrcnn import PVRCNN
from .pv_rcnn_plusplus import PVRCNNPlusPlus
from .obj_discoverer import ObjectDiscoverer
from .second_net_iou import SECONDNetIoU
from .voxel_rcnn import VoxelRCNN
from .v2x_late_fusion import V2XLateFusion

__all__ = {
    "CaDDN": CaDDN,
    "CenterPoint": CenterPoint,
    "MPPNet": MPPNet,
    "MPPNetE2E": MPPNetE2E,
    "ObjectDiscoverer": ObjectDiscoverer,
    "PillarNet": PillarNet,
    "PartA2": PartA2Net,
    "PartA2Net": PartA2Net,
    "PointPillar": PointPillar,
    "PointRCNN": PointRCNN,
    "PVRCNN": PVRCNN,
    "PVRCNNPlusPlus": PVRCNNPlusPlus,
    "SECONDNet": SECONDNet,
    "SECONDNetIoU": SECONDNetIoU,
    "VoxelRCNN": VoxelRCNN,
    "V2XLateFusion": V2XLateFusion,
}


def build_detector(model_cfg, num_class, dataset_info):
    try:
        cls = __all__[model_cfg["NAME"]]
    except KeyError:
        raise NotImplementedError(f"detector {model_cfg['NAME']!r} not implemented")
    return cls(model_cfg=model_cfg, num_class=num_class, dataset_info=dataset_info)
