from .mppnet_head import MPPNetHead
from .parta2_head import PartA2FCHead
from .pointrcnn_head import PointRCNNHead
from .pvrcnn_head import PVRCNNHead
from .second_head import SECONDHead
from .voxelrcnn_head import VoxelRCNNHead
from .roi_head_template import RoIHeadTemplate

__all__ = {
    "MPPNetHead": MPPNetHead,
    "PartA2FCHead": PartA2FCHead,
    "PointRCNNHead": PointRCNNHead,
    "PVRCNNHead": PVRCNNHead,
    "SECONDHead": SECONDHead,
    "VoxelRCNNHead": VoxelRCNNHead,
}


def build_roi_head(cfg, num_class, input_channels, info=None, name="roi_head"):
    try:
        cls = __all__[cfg["NAME"]]
    except KeyError:
        raise NotImplementedError(f"ROI_HEAD {cfg['NAME']!r} is not implemented in pcp_tpu")
    import dataclasses

    fields = {f.name for f in dataclasses.fields(cls)}
    if bool(cfg.get("CLASS_AGNOSTIC", False)):
        num_class = 1
    kwargs = dict(model_cfg=cfg, num_class=num_class, input_channels=input_channels,
                  info=info, name=name)
    kwargs = {k: v for k, v in kwargs.items() if k in fields or k == "name"}
    return cls(**kwargs)
