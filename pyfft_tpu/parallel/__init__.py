from pyfft_tpu.parallel.dist import (
    dist_fft_1d, make_dist_fft, make_dist_fft2, make_dist_fft3)

__all__ = ["dist_fft_1d", "make_dist_fft", "make_dist_fft2",
           "make_dist_fft3"]
