"""Host-side data pipeline: dataset manifests, curriculum sampling, loaders."""

from ewvit_tpu.data.datasets import (  # noqa: F401
    CelebDFDataset,
    DiffusionDataset,
    FaceForensicsDataset,
)
from ewvit_tpu.data.pipeline import BatchLoader, DevicePrefetcher  # noqa: F401
from ewvit_tpu.data.transforms import FaceAligner, FrameTransform  # noqa: F401
from ewvit_tpu.data import native  # noqa: F401
