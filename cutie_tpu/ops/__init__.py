from cutie_tpu.ops.tensor_utils import pad_divide_by, unpad, aggregate, cls_to_one_hot
from cutie_tpu.ops.resize import bilinear_resize, area_downsample, upsample_2x, upsample_4x
from cutie_tpu.ops.memory import get_similarity, topk_softmax, softmax_affinity, readout

__all__ = [
    "pad_divide_by", "unpad", "aggregate", "cls_to_one_hot",
    "bilinear_resize", "area_downsample", "upsample_2x", "upsample_4x",
    "get_similarity", "topk_softmax", "softmax_affinity", "readout",
]
