"""Backend dispatch for ops: 'pallas' | 'xla' | 'auto' (default).

'auto' resolves to Pallas when the default JAX backend is TPU, else XLA.
Tests force either explicitly; `interpret=True` paths let CPU validate the
Pallas kernels themselves.
"""
from __future__ import annotations

import jax

_BACKEND = "auto"


def set_backend(name: str) -> None:
    global _BACKEND
    assert name in ("pallas", "xla", "auto"), name
    _BACKEND = name


def use_pallas() -> bool:
    if _BACKEND == "pallas":
        return True
    if _BACKEND == "xla":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def forced_pallas() -> bool:
    """True only under an explicit set_backend('pallas').

    For ops where the measured default is XLA: the standalone fused-affine
    kernel BREAKS XLA's elementwise fusion into neighboring convs and costs
    2x encoder time on v5e (benchmarks/profile_inference.py, BENCH_NOTES.md)
    — 'auto' must therefore mean XLA there, with Pallas kept reachable for
    its parity/grad tests.
    """
    return _BACKEND == "pallas"
