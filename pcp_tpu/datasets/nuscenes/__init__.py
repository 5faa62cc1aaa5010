from .nuscenes_dataset import NuScenesDataset
