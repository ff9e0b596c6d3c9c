"""Multi-host surface (parallel/multihost.py).

Real multi-host cannot run here (one TPU chip / one CPU process — SURVEY
§2.8 limits documented in the module); coverage is:

* hybrid-mesh LAYOUT logic under fake multi-slice devices — the invariant
  that matters is that the atoms axis never crosses a slice boundary
  (per-round atom collectives must stay on ICI),
* the degenerate single-process distributed runtime (num_processes=1),
  which still exercises the full coordination-service handshake, in a
  subprocess so the test process's already-initialized backend is not
  disturbed,
* env-var fallbacks and idempotence of initialize_distributed.
"""

from __future__ import annotations

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from epnn_tpu.parallel.multihost import (
    _num_slices,
    initialize_distributed,
    make_multihost_mesh,
)


class FakeDev:
    """Minimal stand-in for a pod TPU device (mesh_utils only reads
    id/process_index/slice_index/device_kind)."""

    def __init__(self, i, slice_idx):
        self.id = i
        self.process_index = slice_idx
        self.slice_index = slice_idx
        # platform must NOT be "tpu": mesh_utils then takes a physical
        # coords-based layout path needing real chip topology attributes
        self.device_kind = "fake"
        self.platform = "cpu"

    def __repr__(self):
        return f"D{self.id}s{self.slice_index}"


def _fake_pod(n_slices, per_slice):
    return [FakeDev(i, i // per_slice) for i in range(n_slices * per_slice)]


class TestHybridLayout:
    def test_num_slices(self):
        assert _num_slices(_fake_pod(3, 4)) == 3
        assert _num_slices(jax.devices()) == 1  # CPU: no slice_index

    def test_atoms_axis_never_crosses_dcn(self):
        devs = _fake_pod(2, 4)
        mesh = make_multihost_mesh(n_atoms=2, devices=devs)
        assert mesh.shape == {"data": 4, "atoms": 2}
        arr = np.asarray(mesh.devices)
        # every atoms-axis row lives inside ONE slice
        for row in arr:
            assert len({d.slice_index for d in row}) == 1
        # the data axis carries both slices (DCN parallelism lives there)
        assert {d.slice_index for d in arr[:, 0]} == {0, 1}

    def test_default_n_data_uses_everything(self):
        mesh = make_multihost_mesh(devices=_fake_pod(2, 4))
        assert mesh.shape == {"data": 8, "atoms": 1}

    def test_oversized_atoms_axis_rejected(self):
        with pytest.raises(ValueError, match="ICI"):
            make_multihost_mesh(n_atoms=8, devices=_fake_pod(2, 4))
        with pytest.raises(ValueError, match="ICI"):
            make_multihost_mesh(n_atoms=3, devices=_fake_pod(2, 4))

    def test_bad_n_data_rejected(self):
        with pytest.raises(ValueError, match="n_data"):
            make_multihost_mesh(n_data=2, n_atoms=2, devices=_fake_pod(2, 4))

    def test_uneven_slices_rejected(self):
        devs = _fake_pod(2, 4)[:-1]
        with pytest.raises(ValueError, match="uneven"):
            make_multihost_mesh(devices=devs)

    def test_single_slice_falls_back_to_plain_mesh(self):
        if len(jax.devices()) < 2:
            pytest.skip("needs the virtual CPU mesh")
        mesh = make_multihost_mesh(n_data=2, n_atoms=2)
        assert mesh.shape == {"data": 2, "atoms": 2}
        assert mesh.devices.flatten()[0] in jax.devices()


class TestInitialize:
    def test_env_var_fallback(self, monkeypatch):
        calls = {}
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: calls.update(kw))
        monkeypatch.setenv("EPNN_COORDINATOR", "h0:9999")
        monkeypatch.setenv("EPNN_NUM_PROCESSES", "4")
        monkeypatch.setenv("EPNN_PROCESS_ID", "2")
        initialize_distributed()
        assert calls == {"coordinator_address": "h0:9999",
                         "num_processes": 4, "process_id": 2}

    def test_explicit_args_win(self, monkeypatch):
        calls = {}
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: calls.update(kw))
        monkeypatch.setenv("EPNN_COORDINATOR", "h0:9999")
        initialize_distributed(coordinator_address="h1:1", num_processes=1,
                               process_id=0)
        assert calls["coordinator_address"] == "h1:1"


def test_single_process_runtime_end_to_end():
    """Degenerate (num_processes=1) distributed runtime: the coordination
    service starts, process_count()==1, the multihost mesh builds over the
    virtual CPU devices, and a sharded forward conserves charge.
    Subprocess-isolated: jax.distributed must initialize before the
    backend, and the test process's backend is already up.

    The coordinator port is allocated fresh per run (bind-to-0): a fixed
    port collides when two test sessions overlap on one machine — the
    stale coordinator answers the new worker and aborts it with
    "connected with a different incarnation"."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    code = f"PORT = {port}\n" + """
import os
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from epnn_tpu.parallel.multihost import (
    initialize_distributed, is_coordinator, make_multihost_mesh)
initialize_distributed(coordinator_address=f"localhost:{PORT}",
                       num_processes=1, process_id=0)
initialize_distributed()  # idempotent second call must no-op
assert jax.process_count() == 1
assert is_coordinator()
assert len(jax.devices()) == 8, jax.devices()
mesh = make_multihost_mesh(n_data=2, n_atoms=4)
assert dict(mesh.shape) == {"data": 2, "atoms": 4}

from epnn_tpu.models import EPNNConfig, init_params
from epnn_tpu.ops import fuse_params
from epnn_tpu.parallel.atom_shard import forward_atom_sharded_nbr_batch
cfg = EPNNConfig(h_dim=16, e_dim=16, msg_dim=8, mlp_hidden=(8, 8), T=2)
fused = fuse_params(init_params(cfg, jax.random.key(0)), cfg)
g = np.random.default_rng(0)
b, n = 2, 16
x = g.normal(size=(b, n, cfg.n_elems)).astype(np.float32)
xyz = g.uniform(0, 6, size=(b, n, 3)).astype(np.float32)
mask = np.ones((b, n), np.float32)
q0 = np.full((b, n), 1.0 / n, np.float32)
q = np.asarray(forward_atom_sharded_nbr_batch(
    fused, x, q0, xyz, mask, cfg, mesh, k=8))
np.testing.assert_allclose(q.sum(1), np.ones(b), atol=1e-4)
print("MULTIHOST_OK")
"""
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["EPNN_PLATFORM"] = "cpu"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run([sys.executable, "-c", code], cwd=root, env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "MULTIHOST_OK" in proc.stdout, proc.stdout


def test_cli_multihost_flag(tmp_path, toy_molecules):
    """`train --multihost` joins the (degenerate num_processes=1) runtime
    from the EPNN_* env vars, builds the global mesh, and trains.
    Subprocess: distributed init must precede backend init."""
    data = tmp_path / "data"
    data.mkdir()
    for m in toy_molecules:
        lines = [str(m.natoms), f"{m.total_charge:g} 1"]
        for s, xyz in zip(m.symbols, m.xyz):
            lines.append(f"{s} {xyz[0]} {xyz[1]} {xyz[2]}")
        (data / f"{m.name}.xyz").write_text("\n".join(lines) + "\n")
        np.save(data / f"{m.name}.npy", m.labels)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["EPNN_PLATFORM"] = "cpu"
    env["EPNN_COORDINATOR"] = "localhost:18477"
    env["EPNN_NUM_PROCESSES"] = "1"
    env["EPNN_PROCESS_ID"] = "0"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-m", "epnn_tpu", "train", "--data", str(data),
         "--out", str(tmp_path / "run"), "--epochs", "2", "--batch-size",
         "4", "--rounds", "2", "--h-dim", "16", "--e-dim", "16",
         "--msg-dim", "8", "--layers", "8", "8", "--multihost"],
        cwd=root, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "multi-host mesh over" in proc.stdout, proc.stdout
    assert "best val masked MAE" in proc.stdout, proc.stdout
