from .datasets import get_dataset, Frame  # noqa: F401
from .prefetch import Prefetcher  # noqa: F401
