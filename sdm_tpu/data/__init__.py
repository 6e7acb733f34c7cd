from sdm_tpu.data.datasets import (
    ImageDataset,
    ConditionalImgDataset,
    DoodleImgDataset,
)
from sdm_tpu.data.loader import DataLoader
