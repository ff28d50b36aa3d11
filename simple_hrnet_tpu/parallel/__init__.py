from simple_hrnet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, replicate, shard_batch, data_sharding, replicated_sharding)
from simple_hrnet_tpu.parallel import distributed  # noqa: F401
