from .wav_io import read_wav_16k, write_wav  # noqa: F401
from .se_dataset import (  # noqa: F401
    SEDataset,
    SEH5Dataset,
    RandomChunkSEDataset,
    RandomChunkSEF0Dataset,
    collate_batch,
)
from .aco import read_aco_file, write_aco_file, interpolation, wav2lf0  # noqa: F401
from .vc_dataset import VCDataset, varlen_wav_collate  # noqa: F401
from .loader import DataLoader  # noqa: F401
from .augment import Additive, ComposeAdditive  # noqa: F401
