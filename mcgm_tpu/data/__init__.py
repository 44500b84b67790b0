from .datasets import (ArrayDataset, EMNIST_SUBSETS, fetch_dataset,
                       process_dataset)  # noqa: F401
from .loader import DataLoader, make_data_loader, normalize_images  # noqa: F401
from .stats import Stats, make_stats  # noqa: F401
