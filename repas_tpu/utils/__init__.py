from repas_tpu.utils.logging import get_logger
from repas_tpu.utils.profiling import stage_timer, FpsCounter

__all__ = ["get_logger", "stage_timer", "FpsCounter"]
