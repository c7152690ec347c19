from cutie_tpu.models.cutie import CUTIE

__all__ = ["CUTIE"]
