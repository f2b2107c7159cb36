from parakeet_slam_tpu.dist import mesh
from parakeet_slam_tpu.dist.mesh import (
    make_mesh,
    particle_sharding,
    replicated,
    shard_particle_state,
)
