from dtt.parallel.mesh import (data_mesh, data_sharded, global_mesh,
                               initialize_distributed, replicated)

__all__ = ["data_mesh", "data_sharded", "global_mesh",
           "initialize_distributed", "replicated"]
