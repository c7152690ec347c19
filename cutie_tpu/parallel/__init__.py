from cutie_tpu.parallel.mesh import make_mesh, data_sharding, replicated
from cutie_tpu.parallel.sharded_memory import (make_mem_mesh, shard_memory,
                                               sharded_composite_readout,
                                               sharded_topk_readout)

__all__ = ["make_mesh", "data_sharding", "replicated",
           "make_mem_mesh", "shard_memory", "sharded_composite_readout",
           "sharded_topk_readout"]
