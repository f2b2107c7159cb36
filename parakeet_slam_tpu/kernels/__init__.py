from parakeet_slam_tpu.kernels import ekf_update, match, mathx, resample, resample_pallas, schur
