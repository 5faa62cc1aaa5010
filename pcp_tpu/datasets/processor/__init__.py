from .point_feature_encoder import PointFeatureEncoder
from .data_processor import DataProcessor
