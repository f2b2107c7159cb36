from parakeet_slam_tpu.frontend import camera, describe, detect
from parakeet_slam_tpu.frontend.detect import detect as detect_features
from parakeet_slam_tpu.frontend.describe import describe as describe_features
