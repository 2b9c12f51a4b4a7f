"""Checkpoint save/load.

Parity surface: `pointcept/engines/hooks/misc.py:168-274` — atomic
``model_last`` writes (tmp + rename), best-copy, full resume of optimizer/
scheduler state.  Serialization is flax msgpack (no torch pickle).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    """Atomically write a checkpoint: a dict of pytrees + scalars."""
    state_dict = serialization.to_state_dict(payload)  # tuples/namedtuples -> dicts
    data = serialization.msgpack_serialize(
        jax.tree_util.tree_map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, state_dict)
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_into(template, loaded):
    """Restore a loaded (dict-of-arrays) tree into the structure of ``template``
    (handles tuple/namedtuple opt states via flax's from_state_dict)."""
    return serialization.from_state_dict(template, loaded)
