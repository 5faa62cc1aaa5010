from .base_bev_backbone import BaseBEVBackbone, BaseBEVBackboneV1
from .sc_conv_backbone import SCConvBackbone2dStride1, SCConvBackbone2dStride4

__all__ = {
    "BaseBEVBackbone": BaseBEVBackbone,
    "BaseBEVBackboneV1": BaseBEVBackboneV1,
    "SCConvBackbone2dStride1": SCConvBackbone2dStride1,
    "SCConvBackbone2dStride4": SCConvBackbone2dStride4,
}


def build_backbone_2d(cfg, input_channels, bf16=False, name="backbone_2d"):
    cls = __all__[cfg["NAME"]]
    return cls(model_cfg=cfg, input_channels=input_channels, bf16=bf16, name=name)
