from .io import load_video, save_video, preprocess
from .dataset import PairedCaptionVideoDataset, shard_for_process
from .degradation import degrade_video, sample_degradation_params
from .webds import TarVideoDataset
from .dataset import CogPairedCaptionDataset
from .dataset import PairedCaptionImageDataset
