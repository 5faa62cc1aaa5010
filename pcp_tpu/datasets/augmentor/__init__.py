from .data_augmentor import DataAugmentor
