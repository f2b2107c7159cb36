from parakeet_slam_tpu.kernels import resample
