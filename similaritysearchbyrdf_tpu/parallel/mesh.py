"""Mesh helpers for the sharded forest."""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh


SHARD_AXIS = "shard"


def make_forest_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D device mesh over the forest-shard axis. Each device holds a
    corpus shard with a full forest over it — the TPU replacement for the
    reference's (vestigial) Akka-cluster distribution (SURVEY.md §2.5 P7):
    queries are replicated, candidate generation is shard-local, and the
    final merge is one all-gather of per-shard top-k over ICI."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return jax.make_mesh((n,), (SHARD_AXIS,), devices=devices[:n])
