"""Re-export: the MLP head lives in ``mimikit_tpu.modules.heads``."""
from ..modules.heads import MLP

__all__ = ["MLP"]
