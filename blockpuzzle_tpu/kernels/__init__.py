"""Pallas TPU kernels with bit-identical jnp fallbacks (layer T3)."""

from blockpuzzle_tpu.kernels.clear import ClearScanKernel, clear_scan_reference
from blockpuzzle_tpu.kernels.collision import ApplyKernel, LegalityKernel
from blockpuzzle_tpu.kernels.mask import MaskKernel

__all__ = [
    "ClearScanKernel",
    "clear_scan_reference",
    "ApplyKernel",
    "LegalityKernel",
    "MaskKernel",
]
