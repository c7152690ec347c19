from cutie_tpu.inference.inference_core import InferenceCore
from cutie_tpu.inference.object_manager import ObjectInfo, ObjectManager

__all__ = ["InferenceCore", "ObjectManager", "ObjectInfo"]
