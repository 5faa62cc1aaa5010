from .custom_dataset import CustomDataset, create_custom_infos
