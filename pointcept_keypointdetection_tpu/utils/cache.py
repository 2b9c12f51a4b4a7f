"""Shared-memory dataset cache.

Parity surface: `pointcept/utils/cache.py` — /dev/shm-backed cross-process
cache of preprocessed samples (the reference uses SharedArray +
ShareableList).  Here: one ``.npz`` per key under /dev/shm (or a fallback
tmpdir), which worker threads/processes of the same host share via the page
cache.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict, Optional

import numpy as np

CACHE_ROOT = "/dev/shm/pkt_cache" if os.path.isdir("/dev/shm") else "/tmp/pkt_cache"


def _path(name: str) -> str:
    digest = hashlib.sha1(name.encode()).hexdigest()[:16]
    return os.path.join(CACHE_ROOT, f"{digest}.npz")


def shared_dict(name: str, data: Optional[Dict[str, np.ndarray]] = None) -> Dict[str, np.ndarray]:
    """Store (first call with data) or load a dict of arrays by name."""
    path = _path(name)
    if data is not None:
        os.makedirs(CACHE_ROOT, exist_ok=True)
        tmp = path + f".tmp{os.getpid()}.npz"  # np.savez appends .npz if missing
        np.savez(tmp, **data)
        os.replace(tmp, path)
        return data
    with np.load(path, allow_pickle=False) as f:
        return {k: f[k] for k in f.files}


def exists(name: str) -> bool:
    return os.path.isfile(_path(name))


def clear():
    import shutil

    shutil.rmtree(CACHE_ROOT, ignore_errors=True)
