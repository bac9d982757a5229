from bndm_tpu.data.imagefolder import ImageFolderDataset, BatchLoader
from bndm_tpu.data.latent_cache import LatentCacheWriter, LatentCacheDataset

__all__ = ["ImageFolderDataset", "BatchLoader", "LatentCacheWriter", "LatentCacheDataset"]
