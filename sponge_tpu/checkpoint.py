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

import hashlib
import json

import numpy as np

from .poseidon.config import PoseidonConfig
from .poseidon.oracle import SpongeState
from .sponge import PoseidonSponge


def _json_safe(v):
    if isinstance(v, int):
        return str(v)  # unbounded field elements serialize as decimal strings
    if isinstance(v, (tuple, list)):
        return [_json_safe(x) for x in v]
    return v


def _cfg_fingerprint(cfg) -> str:
    # Every constant table enters as a sha256 over its full canonical
    # serialization — two user configs sharing geometry but differing anywhere
    # in the tables must NOT validate against each other's checkpoints.
    # Config-agnostic: all dataclass fields of the permutation config
    # (PoseidonConfig's ark/mds, Poseidon2Config's rc/matrix data, any future
    # family) are hashed generically.
    import dataclasses

    tables = {"modulus": str(cfg.field.modulus)}
    for f in dataclasses.fields(cfg):
        if f.name == "field":
            continue
        tables[f.name] = _json_safe(getattr(cfg, f.name))
    tables_hash = hashlib.sha256(
        json.dumps(tables, sort_keys=True).encode()
    ).hexdigest()
    return json.dumps(
        {
            # Fingerprint format v2 (multi-family): adds "kind"/"version" and
            # hashes ALL config fields generically.  v1 checkpoints (written
            # before Poseidon2 support) fail validation and must be
            # regenerated — the formats are deliberately not cross-readable,
            # since v1 hashed only ark/mds.
            "version": 2,
            "kind": type(cfg).__name__,
            "field": cfg.field.name,
            "rate": cfg.rate,
            "capacity": cfg.capacity,
            "alpha": cfg.alpha,
            "full_rounds": cfg.full_rounds,
            "partial_rounds": cfg.partial_rounds,
            "tables_sha256": tables_hash,
        }
    )


def save_sponge(path, sponge: PoseidonSponge) -> None:
    """Durable snapshot of a batched sponge (state plane + duplex bookkeeping)."""
    state = sponge.into_state()
    rows = np.asarray(
        [[str(v) for v in row] for row in state.state], dtype=object
    )
    # Unicode width sized from the field: values are < p, so the decimal digit
    # count of the modulus bounds every entry (a fixed "U100" would silently
    # truncate >332-bit custom fields).
    width = len(str(sponge.cfg.field.modulus))
    np.savez(
        path,
        kind="sponge",
        config=_cfg_fingerprint(sponge.cfg),
        mode=state.mode,
        index=state.index,
        values=rows.astype(f"U{width}"),
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
