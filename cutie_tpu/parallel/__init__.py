from cutie_tpu.parallel.mesh import make_mesh, data_sharding, replicated

__all__ = ["make_mesh", "data_sharding", "replicated"]
