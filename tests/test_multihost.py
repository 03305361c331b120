"""True multi-process integration test: 2 jax.distributed processes x 4
virtual CPU devices = one 8-device global mesh, with the engine's
collectives (psum_scatter / all_to_all) crossing process boundaries.

This is the closest CPU-only analogue of a multi-host TPU pod run (the
reference's equivalent is its in-process two-worker Dask cluster,
test_api.py) — same SPMD program as launch_scripts/demo_multihost.py.
"""

import os
import socket
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    """
    import os, sys
    proc_id = int(sys.argv[1])
    port = sys.argv[2]
    repo = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2, process_id=proc_id,
    )
    sys.path.insert(0, repo)
    from ska_sdp_distributed_fourier_transform_tpu import (
        SwiftlyConfig, make_facet, make_full_facet_cover,
        make_full_subgrid_cover)
    from ska_sdp_distributed_fourier_transform_tpu.parallel import (
        ShardedSwiftly, make_tile_mesh)
    from ska_sdp_distributed_fourier_transform_tpu.utils import device_rmse

    assert jax.process_count() == 2
    assert len(jax.devices()) == 8
    cfg = SwiftlyConfig(W=13.5625, fov=1.0, N=512, yB_size=192,
                        yN_size=256, xA_size=192, xM_size=256)
    fcs = make_full_facet_cover(cfg)
    sgs = make_full_subgrid_cover(cfg)
    eng = ShardedSwiftly(cfg._core, fcs, sgs, make_tile_mesh())
    facets = [make_facet(512, c, [(1, 2, -3)]) for c in fcs]
    packed = eng.pack_facets(facets)
    ref = eng.pack_facets(facets)
    out, n = eng.roundtrip(packed)
    rmse = float(device_rmse(out, ref))
    assert n == 9, n
    assert rmse < 1e-4, rmse  # c64 working precision
    print(f"MULTIHOST_OK {jax.process_index()} {rmse:.3e}")
    """
)


def test_two_process_mesh(tmp_path):
    # free port for the coordinator
    s = socket.socket()
    s.bind(("localhost", 0))
    port = str(s.getsockname()[1])
    s.close()

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), port, REPO],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
        assert "MULTIHOST_OK" in out
