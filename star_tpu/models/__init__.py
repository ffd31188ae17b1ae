from .unet.unet import ControlledV2VUNet, VideoUNetTrunk
from .dit.dit import CogVideoDiT
from .clip.text import CLIPTextEncoder
from .t5.encoder import T5Encoder
from .conditioner import GeneralConditioner, TextEmbedder
