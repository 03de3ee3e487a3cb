"""Host-side data layer: triplet datasets + async prefetching loader.

Reference: src/kitty.jl (KittyDataset), src/dtk.jl (Depth10k, find_static),
src/dchain.jl (DChain), DataLoaders.jl usage at src/Monodepth.jl:130,153.

Design (TPU-first): datasets yield numpy (L,H,W,C) float32 triplets; the
loader shuffles per epoch, decodes on worker threads, and prefetches batches
so the device never waits on PNG decode (the reference leans on
DataLoaders.jl's worker threads for the same reason).
"""

from .kitti import KittiDataset
from .depth10k import Depth10k, find_static
from .dchain import DChain
from .augment import FlipX
from .loader import DataLoader, device_prefetch, placement_prefetch
from .synthetic import SyntheticDriving, SyntheticTriplets

__all__ = [
    "KittiDataset",
    "Depth10k",
    "find_static",
    "DChain",
    "FlipX",
    "DataLoader",
    "device_prefetch",
    "placement_prefetch",
    "SyntheticDriving",
    "SyntheticTriplets",
]
