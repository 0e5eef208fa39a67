from pyfft_tpu.utils.radix import (
    balanced_split,
    fourstep_split,
    ilog2,
    is_power_of_two,
    radix_decompose,
)

__all__ = [
    "balanced_split",
    "fourstep_split",
    "ilog2",
    "is_power_of_two",
    "radix_decompose",
]
