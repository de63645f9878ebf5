"""Pallas TPU kernels and their runtime gate.

`enabled()` decides whether the codec routes ConvBlock1d through the fused
snake+conv kernel: on by default on TPU backends, forced on (in interpreter
mode) by AFTER_TPU_PALLAS_INTERPRET=1 for CPU testing, killed by
AFTER_TPU_PALLAS=0.
"""

import os


def interpret_mode() -> bool:
    """Run kernels through the Pallas interpreter (CPU testing)."""
    return os.environ.get("AFTER_TPU_PALLAS_INTERPRET") == "1"


def enabled() -> bool:
    """True when the fused kernels should be used on this backend."""
    if os.environ.get("AFTER_TPU_PALLAS") == "0":
        return False
    if interpret_mode():
        return True
    try:
        import jax
        d = jax.devices()[0]
        return (d.platform == "tpu"
                or "tpu" in getattr(d, "device_kind", "").lower())
    except Exception:
        return False


from .fused_conv import (fused_snake_causal_conv,  # noqa: E402,F401
                         reference_snake_causal_conv, reference_snake_conv)
