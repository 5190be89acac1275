from .dataset import TFRecordDataset, SyntheticDataset, load_dataset  # noqa: F401
