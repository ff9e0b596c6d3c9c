"""Native checkpointing (orbax) for params + optimizer state + counters.

The reference only ever saves model weights on validation improvement
(``charge_gn.py:460-462``) — optimizer state is lost, so resume-with-Adam
is impossible there (SURVEY §5).  Here a checkpoint is the full train state:
params, optax state, step/epoch counters, best-val metric, and the model
config, so training resumes exactly.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

from epnn_tpu.models.config import EPNNConfig

CONFIG_FILE = "config.json"
PARAMS_FILE = "params.msgpack"
STATE_FILE = "train_state.msgpack"
META_FILE = "meta.json"


def _write_atomic(path: str, data, mode: str = "wb") -> None:
    """Write via a same-directory temp file + ``os.replace`` (atomic on
    POSIX): a crash mid-save leaves the previous checkpoint file intact,
    never a torn one.  fsync before the rename so the rename cannot be
    reordered ahead of the data reaching disk."""
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, mode) as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def save_params(directory: str, params: Any, cfg: Optional[EPNNConfig] = None) -> None:
    os.makedirs(directory, exist_ok=True)
    _write_atomic(os.path.join(directory, PARAMS_FILE),
                  serialization.to_bytes(jax.device_get(params)))
    if cfg is not None:
        _write_atomic(os.path.join(directory, CONFIG_FILE),
                      json.dumps(dataclasses.asdict(cfg), indent=2), "w")


def load_config(directory: str) -> EPNNConfig:
    with open(os.path.join(directory, CONFIG_FILE)) as f:
        d = json.load(f)
    d["mlp_hidden"] = tuple(d.get("mlp_hidden", (32, 32)))
    return EPNNConfig(**d)


def load_params(directory: str, template: Any) -> Any:
    """Restore params into the structure of ``template``."""
    with open(os.path.join(directory, PARAMS_FILE), "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_train_state(directory: str, state: Any, meta: Optional[dict] = None) -> None:
    """Serialize a full train state (params + optax state + counters)."""
    os.makedirs(directory, exist_ok=True)
    _write_atomic(os.path.join(directory, STATE_FILE),
                  serialization.to_bytes(jax.device_get(state)))
    if meta is not None:
        meta = {k: (v.item() if isinstance(v, np.generic) else v)
                for k, v in meta.items()}
        _write_atomic(os.path.join(directory, META_FILE),
                      json.dumps(meta, indent=2), "w")


def load_train_state(directory: str, template: Any) -> Any:
    with open(os.path.join(directory, STATE_FILE), "rb") as f:
        return serialization.from_bytes(template, f.read())


def load_meta(directory: str) -> dict:
    path = os.path.join(directory, META_FILE)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def save_train_state_orbax(directory: str, state: Any) -> None:
    """Orbax backend: sharding-aware, async-capable checkpointing for
    multi-host/pod runs (the msgpack format above is single-host).  The two
    formats coexist; orbax writes into ``<directory>/orbax``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, "orbax"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()


def load_train_state_orbax(directory: str, template: Any) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, "orbax"))
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=jax.device_get(template))


def has_checkpoint(directory: str) -> bool:
    return os.path.exists(os.path.join(directory, STATE_FILE)) or os.path.exists(
        os.path.join(directory, PARAMS_FILE)
    )
