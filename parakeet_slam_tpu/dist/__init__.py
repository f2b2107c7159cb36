from parakeet_slam_tpu.dist import dist_ba, mesh, sharded_filter
from parakeet_slam_tpu.dist.mesh import (
    make_mesh,
    particle_sharding,
    replicated,
    shard_particle_state,
)
from parakeet_slam_tpu.dist.sharded_filter import ShardedFastSLAM
