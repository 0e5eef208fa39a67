from pyfft_tpu.ops.twiddle import FORWARD, INVERSE, dft_matrix, twiddle_table

__all__ = ["FORWARD", "INVERSE", "dft_matrix", "twiddle_table"]
