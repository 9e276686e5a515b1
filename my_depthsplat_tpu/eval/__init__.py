from .metrics import compute_psnr, compute_ssim
from .benchmarker import Benchmarker

__all__ = ["Benchmarker", "compute_psnr", "compute_ssim"]
