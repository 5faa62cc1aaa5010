__all__ = {}


def build_backbone_3d(cfg, info, num_point_features):
    try:
        cls = __all__[cfg["NAME"]]
    except KeyError:
        raise NotImplementedError(
            f"BACKBONE_3D {cfg['NAME']!r} is not implemented in pcp_tpu yet "
            f"(sparse 3D backbones land with the v2x_second_* configs)"
        )
    return cls(model_cfg=cfg, info=info, num_point_features=num_point_features)
