from .conditions import ConditionSampler
from .pipeline import generate_data
from .regions import cluster_regions

__all__ = ["ConditionSampler", "generate_data", "cluster_regions"]
