from .unet import ControlledV2VUNet, VideoUNetTrunk
from . import blocks
