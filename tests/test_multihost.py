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


def _free_port() -> int:
    """A coordinator port allocated fresh per run (bind-to-0): a fixed
    port collides when two test sessions overlap on one machine — the
    stale coordinator answers the new worker and aborts it with
    "connected with a different incarnation"."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_single_process_runtime_end_to_end():
    """Degenerate (num_processes=1) distributed runtime: the coordination
    service starts, process_count()==1, the multihost mesh builds over the
    virtual CPU devices, and a sharded forward conserves charge.
    Subprocess-isolated: jax.distributed must initialize before the
    backend, and the test process's backend is already up.

    The coordinator port is allocated fresh per run (see _free_port)."""
    code = f"PORT = {_free_port()}\n" + """
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


_TWO_PROC_WORKER = """
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from epnn_tpu.parallel.multihost import (
    initialize_distributed, make_multihost_mesh)
initialize_distributed(coordinator_address="localhost:%d" % PORT,
                       num_processes=2, process_id=PID)
assert jax.process_count() == 2
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

from epnn_tpu.models import EPNNConfig, init_params
from epnn_tpu.ops import fuse_params
from epnn_tpu.ops.fused import forward_blocked
from epnn_tpu.parallel.atom_shard import (
    forward_atom_sharded_nbr_batch, make_sharded_train_step)

cfg = EPNNConfig(n_elems=10, h_dim=16, e_dim=16, msg_dim=8,
                 mlp_hidden=(8, 8), T=2)
params = init_params(cfg, jax.random.key(0))
params = jax.tree_util.tree_map(
    lambda a: a + 0.2 if a.ndim == 1 else a, params)
fused = fuse_params(params, cfg)
g = np.random.default_rng(3)
b, n, k = 2, 48, 12
x = g.normal(size=(b, n, cfg.n_elems)).astype(np.float32)
xyz = g.uniform(0, 8, size=(b, n, 3)).astype(np.float32)
mask = np.ones((b, n), np.float32); mask[:, -5:] = 0.0
q0 = np.full((b, n), 1.0 / n, np.float32)

# (data=2, atoms=4): the data axis spans the two processes, so the
# per-round atom all-gathers stay process-local and only the data-axis
# collectives cross the process boundary (gloo) — the DCN layout rule.
mesh = make_multihost_mesh(n_data=2, n_atoms=4)
q = forward_atom_sharded_nbr_batch(fused, x, q0, xyz, mask, cfg, mesh,
                                   k=k)
# check MY addressable shards against a locally computed single-chip
# reference (identical on both processes) — no gather needed, and it
# pins values, not just conservation
q_ref = np.asarray(forward_blocked(fused, x, q0, xyz, mask, cfg,
                                   block=16, neighbor_k=k))
scale = np.abs(q_ref).max() + 1.0
worst = max(float(np.abs(np.asarray(s.data) - q_ref[s.index]).max())
            for s in q.addressable_shards)
assert worst < 1e-5 * scale, worst
print("[p%d] forward worst |dq| = %.3e" % (PID, worst), flush=True)

# cross-process TRAINING: gradient psum rides gloo over the data axis
import optax
from epnn_tpu.train import TrainState
import jax.numpy as jnp

opt = optax.adam(3e-3)
step = make_sharded_train_step(cfg, opt, mesh, neighbor_k=k)
state = TrainState(params=params, opt_state=opt.init(params),
                   step=jnp.zeros((), jnp.int32))
y = np.asarray(np.random.default_rng(1).normal(size=q0.shape), np.float32)
w = np.ones((b,), np.float32)
losses = []
for _ in range(3):
    state, loss, _, _ = step(state, x, q0, xyz, mask, y, w)
    losses.append(float(loss))  # replicated scalar: addressable readback
assert losses[-1] < losses[0], losses
print("[p%d] losses %s" % (PID, " ".join("%.8f" % l for l in losses)),
      flush=True)
print("TWOPROC_OK", flush=True)
"""


def test_two_process_runtime_end_to_end():  # default-suite (r4 verdict 6):
    # the REAL cross-process coverage must run every time (~42 s; its two
    # gloo workers are subprocess-isolated, so it is immune to the
    # XLA:CPU in-process collective-executable SIGABRT)
    """REAL multi-process coverage (not the degenerate num_processes=1
    handshake): two OS processes, 4 virtual CPU devices each, join one
    distributed runtime; the atom-sharded forward and the sharded
    training step run on the global 8-device mesh with the data axis
    spanning the process boundary (XLA cross-process collectives via
    gloo).  Each process checks its addressable output shards against a
    locally computed single-chip reference, then trains 3 steps — the
    printed replicated losses must MATCH across the processes (the
    gradient psum crosses processes; divergence would mean the psum
    silently dropped the remote half)."""
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["EPNN_PLATFORM"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             f"PID = {i}\nPORT = {port}\n" + _TWO_PROC_WORKER],
            cwd=root, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i}:\n{out}"
        assert "TWOPROC_OK" in out, f"proc {i}:\n{out}"
    loss_lines = [
        next(ln for ln in out.splitlines() if "losses" in ln).split("]")[1]
        for out in outs
    ]
    assert loss_lines[0] == loss_lines[1], loss_lines


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
    env["EPNN_COORDINATOR"] = f"localhost:{_free_port()}"
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
