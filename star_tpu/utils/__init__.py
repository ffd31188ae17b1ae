from .logger import get_logger
from .seed import setup_seed
from .metrics import psnr, ssim
from . import profiling
