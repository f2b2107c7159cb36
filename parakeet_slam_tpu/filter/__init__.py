from parakeet_slam_tpu.filter import models
from parakeet_slam_tpu.filter.fastslam import FastSLAM, StepMetrics
from parakeet_slam_tpu.filter.fastslam2 import FastSLAM2, make_filter
from parakeet_slam_tpu.filter.runner import run_sequence
