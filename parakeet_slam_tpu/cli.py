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
        est = np.asarray(jnp.stack(est))
        sys_.flush_flags()
        sys_.flush_metrics()
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
        from parakeet_slam_tpu.core import geometry
        from parakeet_slam_tpu.eval import ate_rmse
        from parakeet_slam_tpu.system import SLAMSystem

        if cfg.data.dataset == "tum":
            from parakeet_slam_tpu.data.tum import load_tum

            seq = load_tum(cfg.data.path)
            gt = seq.gt_pose  # [T, 7] (t, qxyzw), NaN rows possible
        elif cfg.data.dataset == "euroc":
            from parakeet_slam_tpu.data.euroc import load_euroc

            seq = load_euroc(cfg.data.path)
            gt = seq.gt_pose
        else:
            from parakeet_slam_tpu.data.kitti import load_kitti

            seq = load_kitti(cfg.data.path)
            gt = _kitti_gt_to_quat(seq.gt_pose) if seq.gt_pose is not None else None

        n = len(seq) if args.frames <= 0 else min(args.frames, len(seq))
        odom = _make_odometry(cfg.data, gt, n)
        stereo = cfg.data.dataset == "kitti" and cfg.filter.obs_dim == 3

        sys_ = SLAMSystem(cfg)
        est = []
        # warmup frames include jit compilation; steady-state fps is timed
        # from frame `warm` (ADVICE r2: headline fps must not amortize
        # compile time over short runs)
        warm = min(3, max(0, n - 1))
        t_loop = time.time()
        t_warm = t_loop
        for i in range(n):
            if stereo:
                est.append(
                    sys_.process_stereo_frame(
                        seq.image(i), seq.image(i, right=True), odom[i]
                    )
                )
            else:
                est.append(sys_.process_frame(seq.image(i), odom[i]))
            if i + 1 == warm:
                jax.block_until_ready(est[-1])
                t_warm = time.time()
        # one batched device->host transfer for the whole trajectory
        est = np.asarray(jnp.stack(est))
        wall = time.time() - t_loop
        fps_ss = (n - warm) / max(time.time() - t_warm, 1e-9)
        sys_.flush_flags()
        sys_.flush_metrics()
        line = (
            f"frames={n} keyframes={len(sys_.keyframes)} "
            f"loop_closures={len(sys_.loop_closures)} "
            f"fps={fps_ss:.2f} (steady-state; incl-compile {n / wall:.2f}) "
            f"wall={wall:.1f}s"
        )
        # Evaluation trajectory: online estimates re-anchored to the
        # optimized keyframe graph (loop closures fix past drift only in
        # this view — the online trajectory keeps it by construction).
        est_opt = sys_.corrected_trajectory(est)
        if gt is not None:
            ok = ~np.isnan(gt[:n, :3]).any(axis=1)
            if ok.sum() >= 3:
                # monocular runs are scale-ambiguous -> Sim(3) alignment
                with_scale = cfg.frontend.camera == "pinhole"
                ate = float(
                    ate_rmse(est_opt[ok, :3], gt[:n][ok, :3], with_scale=with_scale)
                )
                ate_online = float(
                    ate_rmse(est[ok, :3], gt[:n][ok, :3], with_scale=with_scale)
                )
                line += (
                    f" ate_rmse={ate:.4f} m (sim3={with_scale};"
                    f" online {ate_online:.4f})"
                )
        print(line)
        if args.out:
            export_trajectory(args.out, est_opt)
        return

    raise SystemExit(f"unknown dataset {cfg.data.dataset!r}")


def _kitti_gt_to_quat(gt34):
    """KITTI [T, 3, 4] world-from-cam0 matrices -> [T, 7] (t, qxyzw)."""
    import jax.numpy as jnp
    import numpy as np

    from parakeet_slam_tpu.core import geometry

    out = np.zeros((len(gt34), 7), np.float32)
    out[:, :3] = gt34[:, :, 3]
    import jax

    out[:, 3:] = np.asarray(
        jax.vmap(geometry.matrix_to_quat)(jnp.asarray(gt34[:, :, :3]))
    )
    return out


def _make_odometry(data_cfg, gt, n):
    """Per-frame body-frame twist increments [n, 6] for image datasets.

    odom_source="gt": noisy ground-truth increments (simulating the wheel
    odometry the reference consumed — TUM/KITTI ship none); NaN gt rows
    produce zero increments. odom_source="none": zeros (pure visual)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from parakeet_slam_tpu.core import geometry

    odom = np.zeros((n, 6), np.float32)
    if data_cfg.odom_source != "gt" or gt is None:
        return odom
    rng = np.random.default_rng(data_cfg.seed)
    ok = ~np.isnan(gt[:n, :3]).any(axis=1)
    rel = jax.vmap(
        lambda a, b: geometry.se3_log(geometry.se3_between(a, b))
    )(jnp.asarray(gt[: n - 1]), jnp.asarray(gt[1:n]))
    rel = np.asarray(rel)
    good = ok[:-1] & ok[1:]
    sig_t, sig_r = data_cfg.odom_noise
    noise = np.concatenate(
        [rng.normal(0, sig_t, (n - 1, 3)), rng.normal(0, sig_r, (n - 1, 3))],
        axis=1,
    ).astype(np.float32)
    odom[1:][good] = (rel + noise)[good]
    return odom


def cmd_synth(args):
    """Generate a full-scale synthetic dataset in the real TUM/KITTI
    on-disk format (the container ships no dataset downloads; see
    data/synth_vision.py)."""
    import time as _t

    from parakeet_slam_tpu.data import synth_vision as sv

    t0 = _t.time()
    if args.kind == "tum":
        world = sv.make_desk_world(
            num_landmarks=args.landmarks or 1000,
            num_steps=args.steps or 600,
            seed=args.seed,
        )
        sv.write_tum_format(world, args.out)
    elif args.kind == "kitti":
        world = sv.make_drive_world(
            num_landmarks=args.landmarks or 10000,
            num_steps=args.steps or 700,
            seed=args.seed,
        )
        sv.write_kitti_format(world, args.out)
    else:
        raise SystemExit(f"unknown synth kind {args.kind!r}")
    print(
        f"wrote {args.kind} dataset: {len(world)} frames, "
        f"{len(world.landmarks)} landmarks -> {args.out} "
        f"({_t.time() - t0:.1f}s)"
    )


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

    p_synth = sub.add_parser(
        "synth", help="generate a synthetic TUM/KITTI-format dataset"
    )
    p_synth.add_argument("--kind", required=True, choices=("tum", "kitti"))
    p_synth.add_argument("--out", required=True)
    p_synth.add_argument("--steps", type=int, default=0)
    p_synth.add_argument("--landmarks", type=int, default=0)
    p_synth.add_argument("--seed", type=int, default=20)
    p_synth.set_defaults(fn=cmd_synth)

    p_eval = sub.add_parser("eval", help="ATE between two TUM trajectories")
    p_eval.add_argument("--est", required=True)
    p_eval.add_argument("--gt", required=True)
    p_eval.set_defaults(fn=cmd_eval)

    p_bench = sub.add_parser("bench", help="kernel speed-of-light benchmarks")
    p_bench.add_argument("--kernel", default="all")
    p_bench.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    import os

    import jax

    # persistent XLA compilation cache: the vision system compiles ~40 small
    # host-path programs around the first keyframes; over this device link a
    # compile round-trip costs ~0.4 s each, so cold runs pay ~15 s once.
    # User-scoped location (overridable) — writing next to the package would
    # pollute the repo in editable installs and fail on read-only
    # site-packages (advisor r3).
    cache = os.environ.get("PARAKEET_JAX_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "parakeet_slam_tpu", "jax"
    )
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    args.fn(args)


if __name__ == "__main__":
    main()
