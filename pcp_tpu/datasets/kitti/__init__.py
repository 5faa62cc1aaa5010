from .kitti_dataset import KittiDataset, create_kitti_infos
