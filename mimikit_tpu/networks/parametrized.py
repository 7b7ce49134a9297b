"""Re-export: parametrized heads live in ``mimikit_tpu.modules.heads``."""
from ..modules.heads import (
    ParametrizedGaussian,
    ParametrizedLinear,
    ParametrizedLogistic,
)

__all__ = ["ParametrizedGaussian", "ParametrizedLinear", "ParametrizedLogistic"]
