"""Per-kernel speed-of-light benchmarks (BASELINE.json:5 "measure BA/
matching kernel speed-of-light per chip").

Every hot kernel here is memory-bandwidth- or VPU-bound, so the SOL
reference is HBM bandwidth: achieved_bytes/s vs the chip's peak. Peak
constants are per-generation lookup (v5e: 819 GB/s HBM, ~197 bf16
TFLOP/s); the harness prints achieved GB/s, the % of SOL, and wall time
per call. `python -m parakeet_slam_tpu.cli bench` is the front door.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Per-chip peaks (HBM GB/s, fp32 TFLOP/s) by platform version keyword.
_PEAKS = {
    "v5 lite": (819.0, 98.0),
    "v5e": (819.0, 98.0),
    "v4": (1228.0, 137.0),
    "v6": (1640.0, 230.0),
    "cpu": (50.0, 1.0),
}


def _peak_for_device():
    d = jax.devices()[0]
    name = getattr(d, "device_kind", "") or str(d)
    for k, v in _PEAKS.items():
        if k in name.lower():
            return v
    return _PEAKS["cpu"] if d.platform == "cpu" else (819.0, 98.0)


def _time_call(fn, *args, reps=20):
    from parakeet_slam_tpu.eval.profiling import timed

    dt, _ = timed(fn, *args, reps=reps, warmup=1)
    return dt


def bench_ekf(P=2048, L=10240, Z=32):
    """Fused measurement-update kernel at KITTI-config scale."""
    from parakeet_slam_tpu.kernels import ekf_update

    key = jax.random.PRNGKey(0)
    pose = jax.random.normal(key, (P, 3))
    log_w = jnp.zeros((P,))
    lm_mean = jax.random.normal(jax.random.fold_in(key, 1), (P, L, 2)) * 5
    eye = jnp.broadcast_to(0.1 * jnp.eye(2), (P, L, 2, 2))
    lm_sig = jnp.zeros((P, L, 0))
    lm_valid = jnp.ones((P, L), bool)
    lm_count = jnp.ones((P, L), jnp.int32)
    z = jax.random.uniform(key, (Z, 2), minval=1.0, maxval=5.0)
    sig = jnp.zeros((Z, 0))
    valid = jnp.ones((Z,), bool)
    interpret = jax.devices()[0].platform != "tpu"

    def call():
        return ekf_update.measurement_update_2d(
            pose, log_w, lm_mean, jnp.asarray(eye), lm_sig, lm_valid, lm_count,
            z, sig, valid, sig_dim=0, r_var=(0.01, 0.001), sig_var=1.0,
            log_p0=-8.0, init_infl=1.0, max_range=50.0, fov_half=3.2,
            cull=True, interpret=interpret,
        )

    dt = _time_call(call, reps=5)
    # planes r+w once per frame: 7 geom/count/valid planes in+out
    plane_bytes = P * L * 4
    bytes_moved = plane_bytes * 7 * 2
    # dominant flops: Z obs x P x L x ~60 flops
    flops = Z * P * L * 60
    return dt, bytes_moved, flops


def bench_ekf3d(P=1024, L=8192, Z=32, model="equirect_3d"):
    """Fused 3-D vision-model measurement update at panoramic-config scale."""
    from parakeet_slam_tpu.kernels import ekf_update_3d

    W = 8
    Dz = 3 if model == "stereo_3d" else 2
    key = jax.random.PRNGKey(0)
    pose = jnp.concatenate(
        [
            0.01 * jax.random.normal(key, (P, 3)),
            jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]), (P, 4)),
        ],
        axis=1,
    )
    log_w = jnp.zeros((P,))
    lm_mean = jax.random.normal(jax.random.fold_in(key, 1), (P, L, 3)) * 10
    cov = jnp.broadcast_to(0.1 * jnp.eye(3), (P, L, 3, 3))
    lm_desc = jax.random.randint(
        jax.random.fold_in(key, 2), (P, L, W), 0, 2**31 - 1, dtype=jnp.int32
    ).astype(jnp.uint32)
    lm_valid = jnp.ones((P, L), bool)
    lm_count = jnp.ones((P, L), jnp.int32)
    # Observations spread over the full image extent, as a real detector
    # produces (NMS-separated keypoints): clustering all Z observations in
    # one corner makes every one associate to the SAME landmark chain —
    # a worst-case collision cascade no real frame exhibits, which the
    # pre-round-4 bench accidentally measured (z was drawn in a 90x90-px
    # patch of the 2048x1024 panorama).
    lo = jnp.array([0.0, 0.0, 2.0])[:Dz]
    hi_z = jnp.array([2048.0, 1024.0, 40.0])[:Dz]
    z = jax.random.uniform(key, (Z, Dz)) * (hi_z - lo) + lo
    desc = jax.random.randint(
        jax.random.fold_in(key, 3), (Z, W), 0, 2**31 - 1, dtype=jnp.int32
    ).astype(jnp.uint32)
    valid = jnp.ones((Z,), bool)
    interpret = jax.devices()[0].platform != "tpu"
    par = (
        ("fx", 500.0), ("fy", 500.0), ("cx", 1024.0), ("cy", 512.0),
        ("baseline", 0.3), ("img_w", 2048.0), ("img_h", 1024.0),
    )

    def call():
        return ekf_update_3d.measurement_update_3d(
            pose, log_w, lm_mean, jnp.asarray(cov), lm_desc, lm_valid,
            lm_count, z, desc, valid,
            model=model, desc_words=W, par=par,
            r_var=(4.0, 4.0, 2.25)[:Dz], desc_weight=0.1, log_p0=-30.0,
            init_infl=1.0, init_range_prior=5.0, init_range_sigma=2.5,
            max_range=60.0, cull=True, interpret=interpret,
        )

    dt = _time_call(call, reps=5)
    # planes r+w once per frame: 9 geom + W desc + valid + count
    plane_bytes = P * L * 4
    bytes_moved = plane_bytes * (11 + W) * 2
    # dominant flops: Z obs x P x L x ~200 flops (3x3 algebra + hamming)
    flops = Z * P * L * 200
    return dt, bytes_moved, flops


def bench_fs_step(P=1024, L=8192, Z=32, algorithm="fastslam1"):
    """Full filter step (propose + measurement + resample path) at
    panoramic scale through the Pallas kernels — measures the FS2 overhead
    over FS1 (round-3 item: FS2 must stay <= ~1.5x FS1 with the hoisted
    single-sweep association instead of a [P, L] sweep per observation)."""
    from parakeet_slam_tpu.core.config import FilterConfig, FrontendConfig
    from parakeet_slam_tpu.core.state import make_observation
    from parakeet_slam_tpu.filter import make_filter

    cfg = FilterConfig(
        num_particles=P, max_landmarks=L, max_observations=Z,
        lm_dim=3, obs_dim=2, pose_dim=7, sig_dim=0, desc_words=8,
        measurement_model="equirect_3d", motion_model="se3_odometry",
        motion_noise=(0.02, 0.01), meas_noise=(3.0, 3.0),
        init_range_prior=14.0, init_range_sigma=8.0,
        new_landmark_loglik=-14.0, max_range=60.0,
        algorithm=algorithm, use_pallas=True,
    )
    fe = FrontendConfig(camera="equirect", image_size=(1024, 2048))
    slam = make_filter(cfg, fe)
    key = jax.random.PRNGKey(0)
    st = slam.init_state()
    # dense pre-seeded map so the sweep covers all L lanes
    st = st.replace(
        lm_mean=jax.random.normal(jax.random.fold_in(key, 1), (P, L, 3)) * 10,
        lm_cov=jnp.broadcast_to(0.1 * jnp.eye(3), (P, L, 3, 3)) + 0.0,
        lm_desc=jax.random.randint(
            jax.random.fold_in(key, 2), (P, L, 8), 0, 2**31 - 1,
            dtype=jnp.int32,
        ).astype(jnp.uint32),
        lm_valid=jnp.ones((P, L), bool),
        lm_count=jnp.ones((P, L), jnp.int32),
    )
    # full-image spread (see bench_ekf3d: clustered z = artificial
    # worst-case collision cascade)
    z = jax.random.uniform(key, (Z, 2)) * jnp.array([2048.0, 1024.0])
    desc = jax.random.randint(
        jax.random.fold_in(key, 3), (Z, 8), 0, 2**31 - 1, dtype=jnp.int32
    ).astype(jnp.uint32)
    obs = make_observation(z, desc=desc, valid=jnp.ones((Z,), bool))
    u = jnp.zeros((6,)).at[0].set(0.05)

    def call():
        st2, _ = slam.step(st, u, obs, jax.random.PRNGKey(7))
        return st2.pose

    dt = _time_call(call, reps=5)
    plane_bytes = P * L * 4
    n_sweeps = 2 if algorithm == "fastslam2" else 1
    bytes_moved = plane_bytes * (11 + 8) * 2 * n_sweeps
    flops = Z * P * L * 200 * n_sweeps
    return dt, bytes_moved, flops


def bench_resample(P=2048, L=10240):
    from parakeet_slam_tpu.kernels import resample_pallas

    key = jax.random.PRNGKey(0)
    payload = jax.random.normal(key, (P, L * 7))  # full map footprint
    idx = jax.random.randint(jax.random.fold_in(key, 1), (P,), 0, P)
    interpret = jax.devices()[0].platform != "tpu"

    def call():
        return resample_pallas.gather_rows(payload, idx, interpret=interpret)

    dt = _time_call(call, reps=5)
    bytes_moved = payload.size * 4 * 2
    return dt, bytes_moved, 0


def bench_match(N=1024, M=131072, W=8):
    from parakeet_slam_tpu.kernels import match

    key = jax.random.PRNGKey(0)
    qd = jax.random.randint(key, (N, W), 0, 2**31 - 1, dtype=jnp.int32).astype(jnp.uint32)
    db = jax.random.randint(
        jax.random.fold_in(key, 1), (M, W), 0, 2**31 - 1, dtype=jnp.int32
    ).astype(jnp.uint32)
    valid = jnp.ones((M,), bool)
    interpret = jax.devices()[0].platform != "tpu"

    def call():
        return match.hamming_top2(qd, db, valid, interpret=interpret)

    dt = _time_call(call, reps=5)
    # db streams PACKED exactly once (in-kernel unpack); q bit-planes r+w
    bytes_moved = M * W * 4 + N * W * 4 + 2 * N * W * 32 * 2
    # MXU work actually dispatched: the bit-dot identity runs a
    # [N, W*32] x [M, W*32] matmul (2 flops/MAC)
    flops = N * M * (2 * W * 32)
    return dt, bytes_moved, flops


def bench_schur(N=262144):
    from parakeet_slam_tpu.kernels import schur

    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (N, 3, 3))
    C = a @ jnp.swapaxes(a, -1, -2) + 0.5 * jnp.eye(3)
    u = jax.random.normal(jax.random.fold_in(key, 1), (N, 3))
    interpret = jax.devices()[0].platform != "tpu"

    def call():
        return schur.apply_cinv(C, u, interpret=interpret)

    dt = _time_call(call, reps=10)
    bytes_moved = N * (6 + 3 + 3) * 4
    flops = N * 60
    return dt, bytes_moved, flops


def bench_ba(C=64, Pts=50000, obs_per_cam=2000, iters=4, pcg_iters=25):
    """Full Schur/PCG BA iterations/s at EuRoC-config scale (SURVEY.md §7
    'BA iterations/s'): C cameras, 50k landmarks, C*obs_per_cam residuals."""
    from parakeet_slam_tpu.backend import ba as ba_mod
    from parakeet_slam_tpu.backend.graph import make_ba_problem
    from parakeet_slam_tpu.core import geometry
    from parakeet_slam_tpu.frontend.camera import Pinhole

    cam = Pinhole(458.0, 457.0, 367.0, 248.0, 752, 480)
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(
        key, (Pts, 3), minval=-10.0, maxval=10.0
    ) + jnp.array([0.0, 0.0, 15.0])
    poses = jnp.tile(jnp.zeros((7,)).at[6].set(1.0), (C, 1))
    poses = poses.at[:, 0].set(jnp.linspace(0, 5, C))
    O = C * obs_per_cam
    obs_cam = jnp.repeat(jnp.arange(C, dtype=jnp.int32), obs_per_cam)
    obs_pt = jax.random.randint(
        jax.random.fold_in(key, 1), (O,), 0, Pts, dtype=jnp.int32
    )
    uv = jax.vmap(
        lambda c, p: cam.project(
            geometry.se3_apply_inverse(poses[c], pts[p])
        )
    )(obs_cam, obs_pt)
    uv = uv + 0.5 * jax.random.normal(jax.random.fold_in(key, 2), uv.shape)
    prob = make_ba_problem(poses, pts, obs_cam, obs_pt, uv)
    # pack once per problem (the production pattern: system.run_ba packs a
    # problem once, then runs many LM iterations against the device layout)
    from parakeet_slam_tpu.backend.graph import pack_buckets

    bk = pack_buckets(prob)

    def call():
        return ba_mod.optimize_ba(
            cam, bk, iters=iters, pcg_iters=pcg_iters, huber_delta=50.0
        ).problem.cam_pose

    dt = _time_call(call, reps=3)
    # per LM iteration: linearize (O x jacfwd ~ 500 flops) + pcg_iters
    # matvecs (O x ~120 flops each)
    flops = iters * O * (500 + pcg_iters * 120)
    bytes_moved = iters * (1 + pcg_iters) * O * (2 + 12 + 6) * 4
    # report iterations/s through the standard row shape; ms is per call
    return dt / iters, bytes_moved / iters, flops / iters


BENCHES = {
    "ekf_update": bench_ekf,
    "ekf_update_3d": bench_ekf3d,
    "resample": bench_resample,
    "match": bench_match,
    "schur": bench_schur,
    "ba_iteration": bench_ba,
    "fs1_step": lambda: bench_fs_step(algorithm="fastslam1"),
    "fs2_step": lambda: bench_fs_step(algorithm="fastslam2"),
}


def main(args=None):
    which = getattr(args, "kernel", "all") if args else "all"
    peak_bw, peak_tf = _peak_for_device()
    rows = []
    for name, fn in BENCHES.items():
        if which != "all" and which != name:
            continue
        dt, bytes_moved, flops = fn()
        gbs = bytes_moved / dt / 1e9
        tf = flops / dt / 1e12
        rows.append(
            {
                "kernel": name,
                "ms": round(dt * 1e3, 3),
                "GB/s": round(gbs, 1),
                "sol_bw_frac": round(gbs / peak_bw, 3),
                "TFLOP/s": round(tf, 2),
            }
        )
        print(json.dumps(rows[-1]))
    return rows


if __name__ == "__main__":
    main()
