"""Pallas TPU kernels for the framework's hot elementwise paths.

Every kernel has a pure-XLA fallback with identical semantics; dispatch is
runtime-switchable (`set_backend`) and defaults to Pallas on TPU, XLA
elsewhere. Kernels are validated against their fallbacks in tests (CPU
interpret mode).
"""
from .dispatch import set_backend, use_pallas  # noqa: F401
from .fused_affine import affine_relu  # noqa: F401
from .wce import weighted_ce  # noqa: F401
