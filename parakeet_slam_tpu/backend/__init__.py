from parakeet_slam_tpu.backend import ba, graph, posegraph
from parakeet_slam_tpu.backend.graph import (
    BAProblem,
    PoseGraph,
    add_edge,
    add_node,
    make_ba_problem,
    make_pose_graph,
)
