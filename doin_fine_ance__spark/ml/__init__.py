from .pipeline import build_feature_pipeline, train_classifier, predict_categories
from .registry import record_model, active_model, load_config

__all__ = [
    "build_feature_pipeline",
    "train_classifier",
    "predict_categories",
    "record_model",
    "active_model",
    "load_config",
]
