"""Checkpoint / resume for long-running sponge workloads.

The reference's only persistence is ``SpongeExt`` (externalize {state, mode,
index}; /root/reference/src/lib.rs:188-195) — mirrored here by
``SpongeState`` + ``PoseidonSponge.into_state/from_state``.  This module adds
the production side (SURVEY.md §5: "multi-host runner restarts from
checkpointed layer state"): durable on-disk snapshots of sponge states and
Merkle level planes, so a crashed or preempted job resumes mid-protocol /
mid-tree instead of restarting.

Format: a single ``.npz`` per checkpoint (numpy, host-portable, no orbax
dependency) holding int32 limb planes plus JSON-encoded metadata.  Field and
config identity are recorded and validated on load.
"""

from __future__ import annotations

import json
import pathlib
from typing import Optional

import numpy as np

from .fields import get_field
from .poseidon.config import PoseidonConfig
from .poseidon.oracle import SpongeState
from .sponge import PoseidonSponge


def _cfg_fingerprint(cfg: PoseidonConfig) -> str:
    return json.dumps(
        {
            "field": cfg.field.name,
            "rate": cfg.rate,
            "capacity": cfg.capacity,
            "alpha": cfg.alpha,
            "full_rounds": cfg.full_rounds,
            "partial_rounds": cfg.partial_rounds,
            "ark00": str(cfg.ark[0][0]),
            "mds00": str(cfg.mds[0][0]),
        }
    )


def save_sponge(path, sponge: PoseidonSponge) -> None:
    """Durable snapshot of a batched sponge (state plane + duplex bookkeeping)."""
    state = sponge.into_state()
    rows = np.asarray(
        [[str(v) for v in row] for row in state.state], dtype=object
    )
    np.savez(
        path,
        kind="sponge",
        config=_cfg_fingerprint(sponge.cfg),
        mode=state.mode,
        index=state.index,
        values=rows.astype("U100"),
    )


def load_sponge(path, cfg: PoseidonConfig) -> PoseidonSponge:
    """Restore a batched sponge saved by ``save_sponge`` (config-validated)."""
    with np.load(path, allow_pickle=False) as z:
        if str(z["kind"]) != "sponge":
            raise ValueError("not a sponge checkpoint")
        if str(z["config"]) != _cfg_fingerprint(cfg):
            raise ValueError("checkpoint was produced under a different config")
        rows = [[int(v) for v in row] for row in z["values"]]
        state = SpongeState(state=rows, mode=str(z["mode"]), index=int(z["index"]))
    return PoseidonSponge.from_state(state, cfg)


def save_merkle_level(path, cfg: PoseidonConfig, level: np.ndarray, depth: int) -> None:
    """Snapshot one Merkle level plane (L, N) at ``depth`` for layer-wise resume."""
    np.savez_compressed(
        path,
        kind="merkle_level",
        config=_cfg_fingerprint(cfg),
        depth=depth,
        plane=np.asarray(level, dtype=np.int32),
    )


def load_merkle_level(path, cfg: PoseidonConfig):
    """-> (plane (L, N) int32, depth).  Resume with hash.merkle_root(plane)."""
    with np.load(path, allow_pickle=False) as z:
        if str(z["kind"]) != "merkle_level":
            raise ValueError("not a merkle-level checkpoint")
        if str(z["config"]) != _cfg_fingerprint(cfg):
            raise ValueError("checkpoint was produced under a different config")
        return z["plane"], int(z["depth"])
