from .dataset import InpaintDataset
from .iterator import BatchIterator, prefetch, shard_batch
from . import transforms
