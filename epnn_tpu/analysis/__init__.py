from epnn_tpu.analysis.polarization import (
    PolarizationResult,
    polarization_response,
    split_dimer,
)

__all__ = ["PolarizationResult", "polarization_response", "split_dimer"]
