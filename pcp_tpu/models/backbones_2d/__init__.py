from .base_bev_backbone import BaseBEVBackbone

__all__ = {
    "BaseBEVBackbone": BaseBEVBackbone,
}


def build_backbone_2d(cfg, input_channels, name="backbone_2d"):
    cls = __all__[cfg["NAME"]]
    return cls(model_cfg=cfg, input_channels=input_channels, name=name)
