"""Dataset registry + build_dataloader (counterpart of reference
pcdet/datasets/__init__.py:54-84)."""
from .custom import CustomDataset
from .dataset import DatasetTemplate
from .kitti import KittiDataset
from .loader import DataLoader
from .nuscenes import NuScenesDataset
from .v2x_sim import (
    V2XSimDataset_RSU,
    V2XSimDataset_CAR,
    V2XSimDataset_EGO,
    V2XSimDataset_EGO_LATE,
    V2XSimDataset_EGO_EARLY,
    V2XSimDataset_EGO_DISCO,
)

__all__ = {
    "CustomDataset": CustomDataset,
    "DatasetTemplate": DatasetTemplate,
    "KittiDataset": KittiDataset,
    "NuScenesDataset": NuScenesDataset,
    "V2XSimDataset_RSU": V2XSimDataset_RSU,
    "V2XSimDataset_CAR": V2XSimDataset_CAR,
    "V2XSimDataset_EGO": V2XSimDataset_EGO,
    "V2XSimDataset_EGO_LATE": V2XSimDataset_EGO_LATE,
    "V2XSimDataset_EGO_EARLY": V2XSimDataset_EGO_EARLY,
    "V2XSimDataset_EGO_DISCO": V2XSimDataset_EGO_DISCO,
}


def build_dataloader(dataset_cfg, class_names, batch_size, dist=False, root_path=None,
                     workers=4, seed=None, logger=None, training=True,
                     merge_all_iters_to_one_epoch=False, total_epochs=0, source=None):
    cls = __all__[dataset_cfg["DATASET"]]
    kwargs = dict(
        dataset_cfg=dataset_cfg,
        class_names=class_names,
        root_path=root_path,
        training=training,
        logger=logger,
    )
    if dataset_cfg["DATASET"].startswith("V2XSim"):
        kwargs["source"] = source
    dataset = cls(**kwargs)
    if merge_all_iters_to_one_epoch:
        dataset._merge_all_iters_to_one_epoch = True
        dataset.total_epochs = total_epochs

    dataloader = DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=training,
        seed=seed,
        drop_last=training,
        num_workers=workers,
    )
    return dataset, dataloader, None
