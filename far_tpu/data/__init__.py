"""Data layer (reference L4): dataset adapters, samplers, loaders.

Host-side numpy pipeline feeding statically-shaped PairBatch pytrees.
"""

from far_tpu.data.io import (
    read_gray,
    read_color,
    get_mp3d_intrinsics,
    get_mp3d_T_0to1,
    get_interiornet_streetlearn_intrinsics,
    rotation_from_viewpoint,
)
from far_tpu.data.datasets import (
    Mp3dDataset,
    InteriornetStreetlearnDataset,
    MapFreeScene,
    MapFreeDataset,
    SyntheticPairDataset,
)
from far_tpu.data.sampler import scene_balance_indices, random_indices
from far_tpu.data.corruption import corrupt_correspondences
from far_tpu.data.loader import Loader, collate_pairs
