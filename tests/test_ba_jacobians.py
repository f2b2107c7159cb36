"""Closed-form BA Jacobians vs jacfwd (the round-1 linearizer) for all
three camera models. The analytic path is the production linearizer in
backend/ba.py; `linearize_ad` is the oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parakeet_slam_tpu.backend import ba
from parakeet_slam_tpu.backend.graph import make_ba_problem
from parakeet_slam_tpu.core import geometry
from parakeet_slam_tpu.frontend.camera import Equirect, Pinhole, Stereo

CAMS = {
    "pinhole": Pinhole(500.0, 480.0, 320.0, 240.0, 640, 480),
    "stereo": Stereo(500.0, 480.0, 320.0, 240.0, 0.12, 640, 480),
    "equirect": Equirect(1024, 512),
}


def _random_problem(key, camera, n_cams=4, n_pts=32):
    kp, kc, kq, ku = jax.random.split(key, 4)
    pts = jax.random.uniform(kp, (n_pts, 3), minval=-3.0, maxval=3.0)
    if not isinstance(camera, Equirect):
        # keep strictly in front of every camera: jacfwd's depth-clip zeroes
        # the z-column behind the camera, where the linearization is
        # undefined for both paths
        pts = pts + jnp.array([0.0, 0.0, 10.0])
    t = 0.3 * jax.random.normal(kc, (n_cams, 3))
    q = geometry.quat_normalize(
        jnp.array([0.0, 0.0, 0.0, 1.0]) + 0.05 * jax.random.normal(kq, (n_cams, 4))
    )
    poses = jnp.concatenate([t, q], axis=1)
    obs_cam = jnp.tile(jnp.arange(n_cams, dtype=jnp.int32), n_pts)
    obs_pt = jnp.repeat(jnp.arange(n_pts, dtype=jnp.int32), n_cams)
    uv = jax.vmap(
        lambda c, p: camera.project(geometry.se3_apply_inverse(poses[c], pts[p]))
    )(obs_cam, obs_pt)
    uv = uv + 0.3 * jax.random.normal(ku, uv.shape)
    return make_ba_problem(poses, pts, obs_cam, obs_pt, uv)


@pytest.mark.parametrize("name", list(CAMS))
def test_analytic_matches_ad(name):
    camera = CAMS[name]
    prob = _random_problem(jax.random.PRNGKey(3), camera)
    with jax.default_matmul_precision("highest"):
        r_a, Jc_a, Jp_a, w_a = ba.linearize(camera, prob, huber_delta=50.0)
        r_d, Jc_d, Jp_d, w_d = ba.linearize_ad(camera, prob, huber_delta=50.0)
    np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_d), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(Jc_a), np.asarray(Jc_d), rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(Jp_a), np.asarray(Jp_d), rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(w_a), np.asarray(w_d), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("name", list(CAMS))
def test_optimize_ba_converges_with_analytic(name):
    """End-to-end: perturbed problem still converges with the closed-form
    linearizer (cost decreases and beats the initial cost clearly)."""
    camera = CAMS[name]
    prob = _random_problem(jax.random.PRNGKey(5), camera, n_cams=4, n_pts=48)
    key = jax.random.PRNGKey(7)
    prob_noisy = prob.replace(
        points=prob.points + 0.05 * jax.random.normal(key, prob.points.shape),
        cam_fixed=prob.cam_fixed.at[0].set(True),
    )
    c0 = ba.ba_cost(camera, prob_noisy, 50.0)
    res = ba.optimize_ba(camera, prob_noisy, iters=8, pcg_iters=20, huber_delta=50.0)
    c1 = ba.ba_cost(camera, res.problem, 50.0)
    assert float(c1) < 0.5 * float(c0)


def test_packed_matches_obsmajor():
    """Point-major packed path vs the obs-major reference: the normal-
    equation blocks and the Schur matvec agree to fp tolerance, and full
    optimization reaches the same cost. (Pose trajectories are NOT compared
    element-wise: PCG on the 1e12-damped gauge-fixed system is chaotic
    under reduction-order changes.)"""
    from parakeet_slam_tpu.backend.graph import pack_problem

    camera = CAMS["pinhole"]
    prob = _random_problem(jax.random.PRNGKey(11), camera, n_cams=4, n_pts=40)
    key = jax.random.PRNGKey(13)
    prob = prob.replace(
        points=prob.points + 0.05 * jax.random.normal(key, prob.points.shape),
        obs_valid=prob.obs_valid.at[::7].set(False),  # exercise padding
    )
    packed = pack_problem(prob)
    lam = jnp.float32(1e-4)
    with jax.default_matmul_precision("highest"):
        r_o, Jc_o, Jp_o, w_o = ba.linearize(camera, prob, 50.0)
        B_o, C_o, v_o, wg_o = ba._build_blocks(prob, r_o, Jc_o, Jp_o, w_o, lam)
        r_p, Jc_p, Jp_p, w_p = ba.linearize_packed(camera, packed, 50.0)
        B_p, C_p, v_p, wg_p = ba._build_blocks_packed(
            packed, r_p, Jc_p, Jp_p, w_p, lam
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (prob.num_cams, 6))
        mv_o = ba._schur_matvec(x, prob, B_o, C_o, Jc_o, Jp_o, w_o)
        mv_p = ba._schur_matvec_packed(x, packed, B_p, C_p, Jc_p, Jp_p, w_p)
    for a, b in [(B_o, B_p), (C_o, C_p), (v_o, v_p), (wg_o, wg_p), (mv_o, mv_p)]:
        scale = float(jnp.max(jnp.abs(a))) + 1.0
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-5
        )
    # end-to-end: both reach (nearly) the same converged cost
    res_p = ba.optimize_ba(camera, prob, iters=5, pcg_iters=25, huber_delta=50.0)
    res_o = ba.optimize_ba_obsmajor(
        camera, prob, iters=5, pcg_iters=25, huber_delta=50.0
    )
    c0 = float(ba.ba_cost(camera, prob, 50.0))
    c_p = float(ba.ba_cost(camera, res_p.problem, 50.0))
    c_o = float(ba.ba_cost(camera, res_o.problem, 50.0))
    assert c_p < 0.8 * c0 and c_o < 0.8 * c0
    assert abs(c_p - c_o) <= 0.05 * max(c_o, 1.0)


def test_pack_problem_roundtrip():
    """pack_problem buckets every valid observation exactly once."""
    from parakeet_slam_tpu.backend.graph import pack_problem

    camera = CAMS["pinhole"]
    prob = _random_problem(jax.random.PRNGKey(17), camera, n_cams=3, n_pts=10)
    prob = prob.replace(obs_valid=prob.obs_valid.at[::4].set(False))
    packed = pack_problem(prob)
    assert int(packed.p_valid.sum()) == int(prob.obs_valid.sum())
    # each bucketed (point, cam, uv) appears in the original obs list
    lm = np.asarray(packed.p_valid)
    pc = np.asarray(packed.p_cam)
    puv = np.asarray(packed.p_uv)
    oc = np.asarray(prob.obs_cam)
    op = np.asarray(prob.obs_pt)
    ouv = np.asarray(prob.obs_uv)
    ov = np.asarray(prob.obs_valid)
    for p, k in zip(*np.nonzero(lm)):
        hits = (op == p) & (oc == pc[p, k]) & ov
        assert np.any(
            np.all(np.isclose(ouv[hits], puv[p, k]), axis=1)
        )
