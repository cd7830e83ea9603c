from free_hunch_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, all_reduce_mean, batch_sharding,
)
from free_hunch_tpu.parallel.dist import init as dist_init  # noqa: F401
from free_hunch_tpu.parallel.dist import (  # noqa: F401
    barrier, get_rank, get_world_size, print0,
)
