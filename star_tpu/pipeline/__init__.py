from .video_sr import STARPipeline, ModelBundle
from .chunking import make_chunks, sliding_windows_1d, stitch_slices, chunked_x0_fn
from .color_fix import (adain_color_fix, wavelet_color_fix,
                        adaptive_instance_normalization,
                        wavelet_reconstruction)
from .cogvideo_sr import CogVideoSRPipeline, CogModelBundle, CogSamplerConfig
from .build import build_pipeline, init_random_models, make_bundle, StarModels
