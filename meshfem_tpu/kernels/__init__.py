"""Pallas TPU kernels: the hand-scheduled hot paths that XLA cannot reach.

Currently: fused element-stiffness assembly (``element_stiffness_pallas``)
— MXU-native, Gram buffer kept in VMEM, Ke written once at the HBM floor.
"""

from .element_stiffness import element_stiffness_pallas  # noqa: F401
