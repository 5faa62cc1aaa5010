__all__ = {}


def build_corrector(cfg, info, num_bev_features):
    from .hunter_jr import HunterJr
    from .oracle_corrector import OracleCorrector

    registry = {"HunterJr": HunterJr, "OracleCorrector": OracleCorrector}
    cls = registry[cfg["NAME"]]
    return cls(model_cfg=cfg, info=info, num_bev_features=num_bev_features, name="corrector")


def build_bev_maker(cfg, info, role):
    from .bev_maker import BEVMaker

    return BEVMaker(model_cfg=cfg, info=info, role=role, name=role)


def build_v2x_fusion(cfg, info, num_bev_features):
    from .v2x_fusion_disco import V2XMidFusionDisco

    registry = {"DISCO": V2XMidFusionDisco, "V2XMidFusionDisco": V2XMidFusionDisco}
    cls = registry[cfg["NAME"]]
    return cls(model_cfg=cfg, info=info, num_bev_features=num_bev_features, name="v2x_mid_fusion")
