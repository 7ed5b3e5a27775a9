"""Mesh helpers for the sharded forest (single- and multi-process).

Multi-host story (SURVEY.md §7.5, BASELINE configs[4] Deep-100M): call
:func:`init_distributed` in every process (one per host / TPU slice worker),
then :func:`make_forest_mesh` builds the mesh over ALL processes' devices.
Collectives ride ICI within a slice and DCN across slices — XLA picks the
transport from the device topology; the framework only names the axis.

Per-chip HBM budget at Deep-100M (100M rows × 96d, canonical 10×3 tables):
  corpus f32            100M·96·4   = 38.4 GB
  sorted keys+ids       100M·30·8   = 24.0 GB
  bucket arrays (≈N/overflow·30·28) ≈  1.7 GB   (overflow 500)
  total ≈ 64 GB  → one v5e-8 slice at ~8 GB/chip for the index
  (leaving ~8 GB workspace); larger corpora scale linearly in chips.
  The optional coarse tier costs 128 B/row/table on TPU (the int8 lane
  dim pads to 128 physically), i.e. 384 GB at 100M×30 tables — at that
  scale run it with fewer tables (10×1 → 128 GB / 16 GB per chip) or
  disable it (`coarse_dim=None`; the classic exhaustive-scoring path has
  no extra memory).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh


SHARD_AXIS = "shard"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[list] = None,
) -> None:
    """Initialize `jax.distributed` for a multi-process (multi-host) run.
    On TPU pods the arguments are auto-detected from the environment; on
    CPU/GPU pass them explicitly. Must run before any other jax call in the
    process. Safe to call when already initialized (no-op)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def make_forest_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D device mesh over the forest-shard axis. Each device holds a
    corpus shard with a full forest over it — the TPU replacement for the
    reference's (vestigial) Akka-cluster distribution (SURVEY.md §2.5 P7):
    queries are replicated, candidate generation is shard-local, and the
    final merge is one all-gather of per-shard top-k over ICI (DCN across
    slices when the mesh spans processes).

    After `init_distributed`, `jax.devices()` enumerates every process's
    devices, so the same call builds the global multi-host mesh."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return jax.make_mesh((n,), (SHARD_AXIS,), devices=devices[:n])
