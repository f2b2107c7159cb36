"""Restart-based failure recovery (SURVEY.md §6): a sharded run is KILLED
mid-flight (SIGKILL — simulated host loss), then relaunched on a SMALLER
mesh and resumes from the latest snapshot via `multihost.resume_or_init`.

JAX SPMD cannot resize a live mesh, so this restart path IS the recovery
mechanism; the run's global state (particle count etc.) is mesh-size-
independent, so the same snapshot loads under any device count. The
2-process jax.distributed layer itself is covered by test_multiprocess.py.
"""

import json
import os
import subprocess
import sys
import textwrap
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import json, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    n_dev = int(sys.argv[1])
    jax.config.update("jax_num_cpu_devices", n_dev)
    ckpt_dir, total_steps = sys.argv[2], int(sys.argv[3])

    import jax.numpy as jnp
    import numpy as np
    from parakeet_slam_tpu.core.config import FilterConfig
    from parakeet_slam_tpu.core.state import make_observation
    from parakeet_slam_tpu.data import make_corridor
    from parakeet_slam_tpu.dist.mesh import make_mesh
    from parakeet_slam_tpu.dist.multihost import resume_or_init, snapshot_every
    from parakeet_slam_tpu.dist.sharded_filter import ShardedFastSLAM
    from parakeet_slam_tpu.filter import make_filter

    sim = make_corridor(num_landmarks=40, num_steps=40, max_obs=8, seed=5)
    cfg = FilterConfig(
        num_particles=16, max_landmarks=96, max_observations=8, sig_dim=3,
        motion_noise=(0.3, 0.1, 0.3, 0.1), meas_noise=(0.1, 0.03),
        max_range=6.5, fov_half_angle=2.5,
    )
    sharded = ShardedFastSLAM(make_filter(cfg), make_mesh(n_devices=n_dev))

    def init_fn():
        return sharded.init_state(init_pose=jnp.asarray(sim.gt_pose[0]))

    # template defines the (mesh-size-independent) global state layout
    state, start = resume_or_init(ckpt_dir, init_fn(), init_fn)
    snap = snapshot_every(ckpt_dir, 4)
    key = jax.random.PRNGKey(0)
    for t in range(start, total_steps):
        key, k = jax.random.split(key)
        obs = make_observation(
            jnp.asarray(sim.obs_z[t]), sig=jnp.asarray(sim.obs_sig[t]),
            valid=jnp.asarray(sim.obs_valid[t]),
        )
        state, _ = sharded.step(state, jnp.asarray(sim.odom[t]), obs, k)
        snap(jax.device_get(state), t + 1)
        print(f"STEP {t + 1}", flush=True)
    est = np.asarray(sharded.estimate_pose(state))
    print("DONE " + json.dumps(
        {"start": start, "est": [float(v) for v in est]}
    ), flush=True)
    """
)


def test_kill_and_resume_on_smaller_mesh(tmp_path):
    ckpt_dir = str(tmp_path / "snaps")
    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))

    # Phase 1: 8-device run ("2 hosts"); kill it once it has snapshotted.
    p1 = subprocess.Popen(
        [sys.executable, "-u", "-c", WORKER, "8", ckpt_dir, "40"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=REPO, env=env,
    )
    killed_after = None
    deadline = time.time() + 240
    try:
        for line in p1.stdout:
            if line.startswith("STEP"):
                step = int(line.split()[1])
                if step >= 10:  # >= 2 snapshots on disk (every 4)
                    killed_after = step
                    p1.kill()  # simulated host loss (exact child handle)
                    break
            if time.time() > deadline:
                break
    finally:
        if p1.poll() is None:
            p1.kill()
        p1.wait()
    assert killed_after is not None, "phase-1 run never reached step 10"
    snaps = sorted(os.listdir(ckpt_dir))
    assert snaps, "no snapshot written before the kill"

    # Phase 2: relaunch on a 4-device mesh ("one host lost"), resume, finish.
    out = subprocess.run(
        [sys.executable, "-u", "-c", WORKER, "4", ckpt_dir, "40"],
        capture_output=True, text=True, timeout=240, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    done = [ln for ln in out.stdout.splitlines() if ln.startswith("DONE ")]
    assert done, out.stdout[-2000:]
    result = json.loads(done[0][5:])
    # resumed from a snapshot (not from scratch), at or before the kill point
    assert 0 < result["start"] <= killed_after
    assert result["start"] % 4 == 0  # snapshot cadence
    est = np.asarray(result["est"])
    assert np.isfinite(est).all()
    # it tracked the corridor to the end, not diverged after resume
    sim_end_x = 40 * 0.1  # corridor advances ~0.1 m/step
    assert abs(est[0]) < 40.0
