"""Multi-process (simulated multi-host) test: two jax.distributed
processes, each with 4 virtual CPU devices, form a global 8-device mesh
and produce the SAME image as the single-process 8-device mesh — the
determinism that makes multi-host rendering verifiable (SURVEY §4's
fake-device strategy, extended to real process groups over the
jax.distributed coordinator)."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    proc_id = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]
    out = sys.argv[4]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs, process_id=proc_id,
    )
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs

    import numpy as np
    from ray_tracing_tpu import Camera, CameraParam, SceneBuilder
    from ray_tracing_tpu.parallel.distributed import global_mesh, process_info
    from ray_tracing_tpu.parallel.mesh import sharded_render_pass

    b = SceneBuilder(background=(0.2, 0.3, 0.4))
    red = b.add_lambertian(b.add_texture_solid((0.8, 0.2, 0.2)))
    light = b.add_diffuse_light(b.add_texture_solid((3.0, 3.0, 3.0)))
    b.add_sphere((0, 0, -3), 1.0, red)
    b.add_rect("zx", -2, 2, -4, -2, 2.0, light, positive=False, important=True)
    scene = b.build()
    cam = Camera.build(CameraParam((0, 0, 1), (0, 0, -1), 60), 32 / 16)
    img = sharded_render_pass(
        scene, cam, jax.random.key(7),
        width=32, height=16, max_depth=3, antialias=True, mesh=global_mesh(),
    )
    # materialize the full image on every host (DCN allgather)
    from jax.experimental import multihost_utils
    full = multihost_utils.process_allgather(img, tiled=True)
    if proc_id == 0:
        np.save(out, np.asarray(full))
    print("proc", proc_id, "ok", flush=True)
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_render_matches_single_process(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    out = tmp_path / "img.npy"
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd()
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outputs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outputs):
        assert p.returncode == 0, o
    assert "proc 0 ok" in outputs[0] + outputs[1]

    # single-process 8-device reference (this test process)
    import jax

    from ray_tracing_tpu import Camera, CameraParam, SceneBuilder
    from ray_tracing_tpu.parallel.mesh import make_mesh, sharded_render_pass

    b = SceneBuilder(background=(0.2, 0.3, 0.4))
    red = b.add_lambertian(b.add_texture_solid((0.8, 0.2, 0.2)))
    light = b.add_diffuse_light(b.add_texture_solid((3.0, 3.0, 3.0)))
    b.add_sphere((0, 0, -3), 1.0, red)
    b.add_rect("zx", -2, 2, -4, -2, 2.0, light, positive=False, important=True)
    scene = b.build()
    cam = Camera.build(CameraParam((0, 0, 1), (0, 0, -1), 60), 32 / 16)
    expect = np.asarray(
        sharded_render_pass(
            scene, cam, jax.random.key(7),
            width=32, height=16, max_depth=3, antialias=True, mesh=make_mesh(8),
        )
    )
    got = np.load(out)
    np.testing.assert_allclose(got, expect, atol=1e-6)
