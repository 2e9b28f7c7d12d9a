from strutopy_tpu.parallel.mesh import make_mesh, default_mesh
from strutopy_tpu.parallel.sharding import make_sharded_em_step

__all__ = ["make_mesh", "default_mesh", "make_sharded_em_step"]
