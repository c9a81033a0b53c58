from .dataset import FEADataset, collate

__all__ = ["FEADataset", "collate"]
