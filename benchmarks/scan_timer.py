"""Back-compat shim: scan-chain timing now lives in pyfft_tpu.utils.profiling."""
from pyfft_tpu.utils.profiling import time_scan_chain


def scan_time(fn, args, ka=4, kb=24, trials=6, verbose=False):
    return time_scan_chain(fn, args, ka=ka, kb=kb, trials=trials)
