from parakeet_slam_tpu.data import corridor
from parakeet_slam_tpu.data.corridor import CorridorSim, make_corridor
