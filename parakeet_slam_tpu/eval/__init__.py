from parakeet_slam_tpu.eval import metrics
from parakeet_slam_tpu.eval.metrics import ate_rmse, rpe_rmse
