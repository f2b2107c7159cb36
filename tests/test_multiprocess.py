"""True multi-process jax.distributed tests (SURVEY.md §5 "multi-host
without a pod"): spawn 2 local processes, initialize over localhost, build
a global mesh spanning both, and check collectives + distributed BA against
the single-process result.

These run real subprocesses (each a fresh JAX runtime on CPU devices), so
they are the closest CI analog of a 2-host pod slice.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import json, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    coordinator, rank = sys.argv[1], int(sys.argv[2])

    from parakeet_slam_tpu.dist.multihost import initialize_multihost
    initialize_multihost(coordinator, num_processes=2, process_id=rank)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map as shard_map_fn
    except ImportError:
        from jax.experimental.shard_map import shard_map as shard_map_fn

    devs = jax.devices()
    assert len(devs) == 4, f"expected 4 global devices, got {len(devs)}"
    mesh = Mesh(np.array(devs), ("x",))

    # Collective check: psum of per-device ranks over the global mesh.
    def body(x):
        return jax.lax.psum(x, "x")

    f = jax.jit(shard_map_fn(
        body, mesh=mesh, in_specs=P("x"), out_specs=P("x"), check_vma=False,
    ))
    x = jax.device_put(
        jnp.arange(4, dtype=jnp.float32), NamedSharding(mesh, P("x"))
    )
    total = f(x)
    # total is globally sharded; each host reads its addressable piece.
    local_vals = [np.asarray(s.data)[0] for s in total.addressable_shards]
    result = {"rank": rank, "psum": [float(v) for v in local_vals]}

    # Distributed BA over the 4-device map axis vs single-process reference.
    from parakeet_slam_tpu.backend import ba as ba_mod
    from parakeet_slam_tpu.backend.graph import make_ba_problem
    from parakeet_slam_tpu.core import geometry
    from parakeet_slam_tpu.dist import dist_ba
    from parakeet_slam_tpu.dist.mesh import make_mesh
    from parakeet_slam_tpu.frontend.camera import Pinhole

    cam = Pinhole(100.0, 100.0, 32.0, 32.0, 64, 64)
    C, Pts = 4, 16
    rng = np.random.default_rng(0)
    poses = jnp.tile(jnp.zeros((7,)).at[6].set(1.0), (C, 1))
    poses = poses.at[:, 0].set(jnp.arange(C) * 0.1)
    pts = jnp.asarray(rng.uniform(-1, 1, (Pts, 3)) + np.array([0, 0, 5.0]))
    obs_cam = jnp.asarray(np.repeat(np.arange(C), Pts), jnp.int32)
    obs_pt = jnp.asarray(np.tile(np.arange(Pts), C), jnp.int32)
    uv = jax.vmap(
        lambda c, p: cam.project(geometry.se3_apply_inverse(poses[c], pts[p]))
    )(obs_cam, obs_pt)
    uv = uv + 0.2 * jnp.asarray(rng.standard_normal(uv.shape))
    prob = make_ba_problem(poses, pts, obs_cam, obs_pt, uv)

    mesh_ba = make_mesh(n_devices=4, map_axis=4)
    sp = dist_ba.shard_problem(prob, 4)
    out, costs = dist_ba.optimize_ba_distributed(
        cam, sp, mesh_ba, iters=3, pcg_iters=10
    )
    # single-process reference (local math, no collectives)
    ref = ba_mod.optimize_ba(cam, prob, iters=3, pcg_iters=10,
                             huber_delta=2.0)
    diff = float(jnp.max(jnp.abs(
        out.cam_pose - jax.device_get(ref.problem.cam_pose)
    )))
    result["ba_diff"] = diff
    print("RESULT " + json.dumps(result), flush=True)
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_collectives_and_dist_ba(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(r)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, text=True, cwd=REPO,
        )
        for r in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-3000:]}"
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                rec = json.loads(line[len("RESULT "):])
                results[rec["rank"]] = rec
    assert set(results) == {0, 1}, f"missing ranks: {outs}"
    # psum over ranks 0..3 == 6 everywhere
    for rec in results.values():
        assert all(v == 6.0 for v in rec["psum"]), rec
        # distributed BA matches the single-process optimizer
        assert rec["ba_diff"] < 1e-3, rec
