from strutopy_tpu.models.config import STMConfig
from strutopy_tpu.models.state import STMState
from strutopy_tpu.models.stm import STM

__all__ = ["STMConfig", "STMState", "STM"]
