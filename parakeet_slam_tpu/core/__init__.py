from parakeet_slam_tpu.core import config, geometry, linalg, state
from parakeet_slam_tpu.core.config import (
    BackendConfig,
    DataConfig,
    DistConfig,
    FilterConfig,
    FrontendConfig,
    SLAMConfig,
    load_config,
)
from parakeet_slam_tpu.core.state import (
    Observation,
    ParticleState,
    make_observation,
    make_particle_state,
)
