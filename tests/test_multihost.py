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


_HOST_TIER_WORKER = textwrap.dedent(
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
    import numpy as np
    from ska_sdp_distributed_fourier_transform_tpu import (
        SwiftlyConfig, make_facet, make_full_facet_cover,
        make_full_subgrid_cover)
    from ska_sdp_distributed_fourier_transform_tpu.parallel import (
        StreamedSwiftly, make_tile_mesh)

    assert jax.process_count() == 2
    cfg = SwiftlyConfig(W=13.5625, fov=1.0, N=512, yB_size=192,
                        yN_size=256, xA_size=192, xM_size=256)
    fcs = make_full_facet_cover(cfg)
    sgs = make_full_subgrid_cover(cfg)
    eng = StreamedSwiftly(cfg._core, fcs, sgs, mesh=make_tile_mesh())
    # multi-process mesh => process-local host state auto-on: each
    # process stores ONLY its mesh-shard's facets' BF_F/accumulator
    assert eng.process_local
    local = set(eng._store_fidx)
    other = set(range(len(fcs))) - local
    assert local and (not other or local.isdisjoint(other))
    # this process builds only its own facets (the other entries stay
    # None — a real pod never materialises remote facet data)
    facets = [
        make_facet(512, c, [(1, 2, -3)]) if i in local else None
        for i, c in enumerate(fcs)
    ]
    out, n = eng.roundtrip(facets)
    assert n == 9, n
    errs = []
    for fi in eng._store_fidx:
        assert out[fi] is not None
        d = np.asarray(out[fi]) - np.asarray(facets[fi])
        errs.append(float(np.sqrt(np.mean(np.abs(d) ** 2))))
    assert max(errs) < 1e-4, errs  # c64 working precision
    for fi in sorted(other):
        assert out[fi] is None
    print(f"HOSTTIER_OK {jax.process_index()} {max(errs):.3e}")
    """
)


def _run_two_process(script_text, tmp_path):
    # free port for the coordinator
    s = socket.socket()
    s.bind(("localhost", 0))
    port = str(s.getsockname()[1])
    s.close()

    script = tmp_path / "worker.py"
    script.write_text(script_text)
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
    return outs


def test_two_process_mesh(tmp_path):
    outs = [o for o in _run_two_process(_WORKER, tmp_path)]
    for out in outs:
        assert "MULTIHOST_OK" in out


def test_two_process_host_tier(tmp_path):
    """StreamedSwiftly on a 2-process mesh with process-local facet
    state: each process holds only its shard's BF_F/accumulator rows in
    host RAM (the reference's distributed 320-512 GiB-node regime,
    reference slurm_scripts/run_distr_single_astrolab.slurm)."""
    outs = _run_two_process(_HOST_TIER_WORKER, tmp_path)
    for out in outs:
        assert "HOSTTIER_OK" in out
