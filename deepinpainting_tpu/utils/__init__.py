from . import imaging, profiling
from .metrics import MetricsLogger, psnr, ssim
