from .unet.unet import ControlledV2VUNet, VideoUNetTrunk
