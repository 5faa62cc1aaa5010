import dataclasses

from .anchor_head_single import AnchorHeadMulti, AnchorHeadSingle
from .center_head import CenterHead
from .point_head import PointHeadBox, PointHeadSimple, PointIntraPartOffsetHead

__all__ = {
    "AnchorHeadSingle": AnchorHeadSingle,
    "AnchorHeadMulti": AnchorHeadMulti,
    "CenterHead": CenterHead,
    "PointHeadSimple": PointHeadSimple,
    "PointHeadBox": PointHeadBox,
    "PointIntraPartOffsetHead": PointIntraPartOffsetHead,
}


def _filtered_kwargs(cls, kwargs):
    fields = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in kwargs.items() if k in fields or k == "name"}


def build_dense_head(cfg, info, input_channels, num_class, predict_boxes_when_training=False,
                     bf16=False, name="dense_head"):
    cls = __all__[cfg["NAME"]]
    kwargs = dict(
        name=name,
        model_cfg=cfg,
        input_channels=input_channels,
        num_class=num_class,
        class_names=info.class_names,
        grid_size=info.grid_size,
        point_cloud_range=info.point_cloud_range,
        voxel_size=info.voxel_size,
        predict_boxes_when_training=predict_boxes_when_training,
    )
    if hasattr(cls, "bf16"):
        kwargs["bf16"] = bf16
    return cls(**_filtered_kwargs(cls, kwargs))


def build_point_head(cfg, input_channels, num_class, predict_boxes_when_training=False,
                     name="point_head"):
    cls = __all__[cfg["NAME"]]
    num_class = 1 if bool(cfg.get("CLASS_AGNOSTIC", False)) else num_class
    kwargs = dict(
        name=name, model_cfg=cfg, input_channels=input_channels, num_class=num_class,
        predict_boxes_when_training=predict_boxes_when_training,
    )
    return cls(**_filtered_kwargs(cls, kwargs))
