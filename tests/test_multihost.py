"""Multi-host (multi-process) distributed training path.

Launches TWO separate Python processes, each owning 2 virtual CPU devices,
joined through a localhost coordinator into one 4-device GLOBAL mesh —
the same `jax.distributed.initialize` + global-mesh + per-process-batch
code path a real multi-host TPU pod uses (DCN collectives become gloo
CPU collectives here; the XLA partitioning is identical).

Each process runs the full `train()` loop (1 epoch on a shared tiny NPZ):
process slicing of every global batch, cross-process gradient all-reduce,
lead-only checkpoint writes with the pre-save all-gather collective.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = """
import json, os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_enable_compilation_cache", False)

from nerfjax.parallel import init_distributed
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
pi, pc = init_distributed(
    coordinator_address="localhost:" + port, num_processes=nproc, process_id=pid
)
assert (pi, pc) == (pid, nproc), (pi, pc)
assert len(jax.devices()) == 4, jax.devices()          # global
assert len(jax.local_devices()) == 2                    # per-process

from nerfjax.config import ConfigNode, with_defaults
from nerfjax.train import train

tmp = sys.argv[4]
mode = sys.argv[5]
base = {{
    "scene_name": "mh",
    "ngp": True, "nerf_type": "small",
    "batch_size": 64, "num_epochs": 1, "lr": 5e-3,
    "N_samples": 4, "N_importance": 4, "precision": "fp32",
    "occupancy_grid": False, "hash_grad_corners": 8,
    "shard_hash_table": mode in ("tp", "tp2d"),
    "rays_file": os.path.join(tmp, "rays.npz"),
    "output_dir": os.path.join(tmp, "out"),
    "checkpoint_dir": os.path.join(tmp, "out", "ckpt"),
}}
if mode == "tp2d":
    # DP across the 2 processes x TP across each process's 2 local devices:
    # the pod shape where table collectives stay intra-host.
    base["mesh_shape"] = [2, 2]
if mode == "resume":
    # phase 1: 2 epochs -> lead writes nerf_epoch_000002.pth
    train(with_defaults(ConfigNode(dict(base, num_epochs=2))), seed=0,
          log_every=1000)
    # phase 2: resume with a NON-SHARED checkpoint_dir — only the lead's
    # filesystem contains the checkpoint; process 1's dir is empty. The
    # restored epoch/params must still be agreed globally or the
    # processes' collective sequences diverge.
    ckdir = (os.path.join(tmp, "out", "ckpt") if pid == 0
             else os.path.join(tmp, "p1_local_empty"))
    res = train(
        with_defaults(ConfigNode(dict(base, num_epochs=3, checkpoint_dir=ckdir))),
        seed=0, log_every=1000, resume=True,
    )
else:
    res = train(with_defaults(ConfigNode(base)), seed=0, log_every=1)
print("MHRESULT " + json.dumps({{
    "process": pi,
    "loss": res["metrics"].get("loss_total") if res["metrics"] else None,
    "table_sum": float(abs(res["params"]["model"]["table"]).sum()),
}}))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_global_mesh_train(tmp_path):
    _run_two_process(tmp_path, mode="dp")


@pytest.mark.slow
def test_two_process_tensor_parallel_table(tmp_path):
    """shard_hash_table across PROCESSES: each host holds half the hash
    table; the pre-save all-gather collective (train._save_snapshot) is
    what makes the checkpoint writable by process 0 at all."""
    _run_two_process(tmp_path, mode="tp")


@pytest.mark.slow
def test_two_process_dp_tp_2d_mesh(tmp_path):
    """DP x TP 2-D (data, model) mesh across the cluster (round-3 verdict
    #8): rays shard along `data` (one group per process), the hash table
    along `model` (each process's 2 local devices) — cfg mesh_shape=[2,2]."""
    _run_two_process(tmp_path, mode="tp2d")


@pytest.mark.slow
def test_two_process_resume_non_shared_fs(tmp_path):
    """Resume on a pod whose checkpoint_dir is NOT a shared filesystem:
    only the lead sees the checkpoint it wrote; the restored epoch and
    params must be broadcast so both processes take identical step
    sequences (divergent start epochs deadlock the collectives)."""
    outs = _run_two_process(tmp_path, mode="resume")
    assert any("Resumed from" in o for o in outs), outs[0][-2000:]


def _run_two_process(tmp_path, mode, _attempt=0):
    sys.path.insert(0, str(REPO / "tests"))
    from synthetic import make_ray_npz

    make_ray_npz(tmp_path / "rays.npz", n_rays=256)

    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("NERFJAX_COORDINATOR", None)
    # Workers must NOT register the axon TPU plugin (its sitecustomize
    # initializes the backend, which forbids jax.distributed.initialize);
    # with it disabled JAX_PLATFORMS=cpu applies normally.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = []
    for pid in (0, 1):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    "-c",
                    WORKER.format(repo=str(REPO)),
                    str(pid),
                    "2",
                    str(port),
                    str(tmp_path),
                    mode,
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    # Gloo's TCP handshake has a fixed connect timeout that this one-core
    # CI box blows through when a background study starves the workers
    # (observed: "Gloo context initialization failed ... Connect
    # timeout"). That is environment scheduling, not product behavior —
    # retry once on that signature only; any other failure asserts.
    if _attempt == 0 and any(
        p.returncode != 0 for p in procs
    ) and any("Connect timeout" in o or "Gloo context" in o for o in outs):
        return _run_two_process(tmp_path, mode, _attempt=1)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MHRESULT "):
                r = json.loads(line[len("MHRESULT "):])
                results[r["process"]] = r
    assert set(results) == {0, 1}, outs[0][-2000:]

    # Both processes hold identical final (replicated-after-gather) params:
    # the cross-process gradient all-reduce actually synchronized them.
    assert results[0]["table_sum"] == pytest.approx(
        results[1]["table_sum"], rel=1e-6
    )
    # Lead-only logging/checkpointing: process 0 saw metrics and wrote the
    # final checkpoint exactly once; process 1 logged nothing.
    assert results[0]["loss"] is not None
    import numpy as np

    assert np.isfinite(results[0]["loss"])
    assert results[1]["loss"] is None
    assert (tmp_path / "out" / "ckpt" / "nerf_final.pth").exists()
    return outs
