from parakeet_slam_tpu.utils import checkpoint, metrics_log
from parakeet_slam_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from parakeet_slam_tpu.utils.metrics_log import MetricsLogger, export_map, export_trajectory
