"""Command-line interface: run / eval / bench (SURVEY.md §2c `eval/`).

  python -m parakeet_slam_tpu.cli run --config configs/corridor.yaml
  python -m parakeet_slam_tpu.cli bench --config configs/corridor.yaml
  python -m parakeet_slam_tpu.cli eval --est traj.txt --gt gt.txt

Config presets live in `configs/`; any field can be overridden with
`--set filter.num_particles=512`.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _parse_overrides(pairs):
    out = {}
    for p in pairs or []:
        k, v = p.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        out[k] = v
    return out


def cmd_run(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from parakeet_slam_tpu.core.config import load_config
    from parakeet_slam_tpu.utils.metrics_log import export_trajectory

    cfg = load_config(args.config, _parse_overrides(args.set))
    t0 = time.time()

    if cfg.data.dataset == "corridor":
        from parakeet_slam_tpu.data import make_corridor
        from parakeet_slam_tpu.eval import ate_rmse
        from parakeet_slam_tpu.filter import make_filter, run_sequence

        sim = make_corridor(
            num_landmarks=cfg.data.num_landmarks, num_steps=cfg.data.num_steps,
            max_obs=cfg.filter.max_observations, seed=cfg.data.seed,
        )
        slam = make_filter(cfg.filter)
        state = slam.init_state(init_pose=jnp.asarray(sim.gt_pose[0]))
        _, est, metrics = run_sequence(
            slam, state, jnp.asarray(sim.odom), jnp.asarray(sim.obs_z),
            jnp.asarray(sim.obs_sig), jnp.asarray(sim.obs_valid),
            jax.random.PRNGKey(cfg.filter.seed),
        )
        est = jax.block_until_ready(est)
        ate = float(ate_rmse(est[:, :2], sim.gt_pose[:, :2]))
        dt = time.time() - t0
        print(f"frames={len(est)} ate_rmse={ate:.4f} m wall={dt:.1f}s "
              f"fps={len(est)/dt:.1f}")
        if args.out:
            export_trajectory(args.out, np.asarray(est))
        return

    if cfg.data.dataset == "panoramic":
        from parakeet_slam_tpu.data.panoramic import make_panoramic_world
        from parakeet_slam_tpu.system import SLAMSystem

        world = make_panoramic_world(
            num_landmarks=cfg.data.num_landmarks or 300,
            num_steps=cfg.data.num_steps,
            image_size=cfg.frontend.image_size,
            seed=cfg.data.seed,
        )
        sys_ = SLAMSystem(cfg)
        est = []
        for t in range(len(world)):
            est.append(sys_.process_frame(world.render(t), world.odom[t]))
        est = np.stack(est)
        # Filter gauge starts at identity; compose with gt[0] for world-frame
        # drift.
        from parakeet_slam_tpu.core import geometry

        est_world = np.asarray(
            geometry.se3_compose(
                jnp.asarray(world.gt_pose[0]), jnp.asarray(est[-1])
            )
        )
        drift = float(np.linalg.norm(est_world[:3] - world.gt_pose[-1, :3]))
        print(f"frames={len(est)} keyframes={len(sys_.keyframes)} "
              f"loop_closures={len(sys_.loop_closures)} end_drift={drift:.3f} m")
        if args.out:
            export_trajectory(args.out, est)
        return

    if cfg.data.dataset in ("tum", "kitti", "euroc"):
        from parakeet_slam_tpu.system import SLAMSystem

        if cfg.data.dataset == "tum":
            from parakeet_slam_tpu.data.tum import load_tum

            seq = load_tum(cfg.data.path)
        elif cfg.data.dataset == "euroc":
            from parakeet_slam_tpu.data.euroc import load_euroc

            seq = load_euroc(cfg.data.path)
        else:
            from parakeet_slam_tpu.data.kitti import load_kitti

            seq = load_kitti(cfg.data.path)
        sys_ = SLAMSystem(cfg)
        est = []
        n = len(seq) if args.frames <= 0 else min(args.frames, len(seq))
        zero_u = np.zeros((6,), np.float32)
        for i in range(n):
            est.append(sys_.process_frame(seq.image(i), zero_u))
        est = np.stack(est)
        print(f"frames={n} keyframes={len(sys_.keyframes)} "
              f"loop_closures={len(sys_.loop_closures)}")
        if args.out:
            export_trajectory(args.out, est)
        return

    raise SystemExit(f"unknown dataset {cfg.data.dataset!r}")


def cmd_eval(args):
    import numpy as np

    from parakeet_slam_tpu.eval import ate_rmse

    def load_traj(p):
        rows = np.loadtxt(p)
        return rows[:, 1:4]  # TUM format: ts x y z ...

    est, gt = load_traj(args.est), load_traj(args.gt)
    n = min(len(est), len(gt))
    ate = float(ate_rmse(est[:n], gt[:n]))
    print(json.dumps({"ate_rmse_m": round(ate, 5), "frames": n}))


def cmd_bench(args):
    # Delegates to the repo-root headline benchmark for the corridor;
    # kernel-level SOL numbers via eval/bench_kernels.py.
    from parakeet_slam_tpu.eval import bench_kernels

    bench_kernels.main(args)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="parakeet_slam_tpu")
    ap.add_argument(
        "--platform", default="",
        help="force a JAX platform (e.g. cpu); wins over JAX_PLATFORMS, "
        "which this container pins",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="run SLAM on a dataset config")
    p_run.add_argument("--config", required=True)
    # extend: repeated `--set k=v` flags accumulate instead of the last
    # silently replacing all earlier ones (nargs="*" alone does the latter).
    p_run.add_argument(
        "--set", nargs="+", action="extend", default=[],
        help="dotted overrides k=v (repeatable)",
    )
    p_run.add_argument("--out", default="", help="trajectory output (TUM fmt)")
    p_run.add_argument("--frames", type=int, default=0)
    p_run.set_defaults(fn=cmd_run)

    p_eval = sub.add_parser("eval", help="ATE between two TUM trajectories")
    p_eval.add_argument("--est", required=True)
    p_eval.add_argument("--gt", required=True)
    p_eval.set_defaults(fn=cmd_eval)

    p_bench = sub.add_parser("bench", help="kernel speed-of-light benchmarks")
    p_bench.add_argument("--kernel", default="all")
    p_bench.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    args.fn(args)


if __name__ == "__main__":
    main()
