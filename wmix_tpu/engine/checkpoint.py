"""Checkpoint / resume of per-stream DSP state (SURVEY §5 checkpoint row).

The reference daemon is stateless across restarts (live audio only); the
TPU rebuild adds snapshots so a preempted chip can resume every stream's
DSP state mid-stream: the device state pytree (NS quantile trackers, AEC
partitions/filter, AGC capacitors, VAD GMM, the play-FIFO ring) plus the
host-side cursors (AecPlanner ring positions / startup state machine /
comfort-noise PRNG seed, the RecordChain FIFO slot counter).

Round-trip guarantee (tests/test_checkpoint.py): a chain restored from a
snapshot produces the SAME output stream, bit for bit, as one that never
stopped — the host planner replays from identical cursors and the device
leaves are restored exactly.

Format: one .npz with the flattened device leaves plus a JSON header
carrying geometry and host cursors.  No pickle — restore validates the
geometry against the target chain instead of trusting the file.
"""
from __future__ import annotations

import io
import json

import jax
import numpy as np

from wmix_tpu.engine.aec_plan import AecPlanner, _AbsRing


def _planner_state(p: AecPlanner) -> dict:
    out = {}
    for k, v in vars(p).items():
        if isinstance(v, _AbsRing):
            out[k] = {"__ring__": True, "count": v.count, "r": v.r,
                      "w": v.w}
        elif isinstance(v, (bool, int, float)):
            out[k] = v
        else:
            raise TypeError(f"unexpected planner field {k}={type(v)}")
    return out


def _restore_planner(p: AecPlanner, snap: dict) -> None:
    # whitelist: only fields the live planner already has, with matching
    # kinds — a snapshot header is untrusted input (ADVICE r2)
    live = vars(p)
    for k, v in snap.items():
        if k not in live:
            raise ValueError(f"unknown planner field {k!r} in snapshot")
        if isinstance(v, dict) and v.get("__ring__"):
            ring = live[k]
            if not isinstance(ring, _AbsRing):
                raise ValueError(f"planner field {k!r} is not a ring")
            if ring.count != v["count"]:
                raise ValueError(f"ring {k!r} geometry mismatch: "
                                 f"{ring.count} != {v['count']}")
            ring.r, ring.w = int(v["r"]), int(v["w"])
        elif isinstance(v, (bool, int, float)) and \
                isinstance(live[k], (bool, int, float)):
            setattr(p, k, type(live[k])(v))
        else:
            raise ValueError(f"planner field {k!r} has unexpected type")


def _aec_layout(chain) -> str:
    from wmix_tpu.engine import aec_pallas, aecm_step
    if isinstance(chain.state.aec, aec_pallas.PallasAecState):
        return "pallas"
    if isinstance(chain.state.aec, aecm_step.AecmEngState):
        return "aecm"
    return "jax"


def snapshot(chain) -> bytes:
    """Serialize a RecordChain's full streaming state to bytes."""
    leaves = jax.tree_util.tree_leaves(chain.state)
    header = {
        "batch": chain.batch,
        "freq": chain.freq,
        "chn": getattr(chain, "chn", 1),
        "flags": list(chain.flags),
        "agc_gain_db": chain.agc_gain_db,
        "part_cap": chain.part_cap,
        "play_count": chain.play_count,
        "tick": chain.tick,
        "planner": _planner_state(chain.planner) if chain.planner
        else None,
        "n_leaves": len(leaves),
        # the AEC state layout (exact-jax vs pallas-kernel) changes the
        # pytree structure; record it so a production (pallas) snapshot
        # restores into a fresh chain whose default layout is jax
        # (ADVICE r2 medium)
        "aec_layout": _aec_layout(chain),
        # the NSX backend likewise changes the ns pytree structure
        "ns_backend": getattr(chain, "ns_backend", "ns"),
    }
    buf = io.BytesIO()
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["header"] = np.frombuffer(
        json.dumps(header).encode(), np.uint8)
    np.savez(buf, **arrays)
    return buf.getvalue()


def restore(chain, data: bytes) -> None:
    """Restore a snapshot into a freshly constructed RecordChain of the
    same geometry (batch/freq/flags).  In-place."""
    with np.load(io.BytesIO(data)) as z:
        header = json.loads(bytes(z["header"].tobytes()).decode())
        leaves = [z[f"leaf_{i}"] for i in range(header["n_leaves"])]

    if header.get("chn", 1) != getattr(chain, "chn", 1):
        raise ValueError("chn mismatch")
    for key in ("batch", "freq", "part_cap"):
        if header[key] != getattr(chain, key):
            raise ValueError(f"{key} mismatch: snapshot "
                             f"{header[key]} != chain {getattr(chain, key)}")
    if tuple(header["flags"]) != tuple(chain.flags):
        raise ValueError("flags mismatch")
    want_ns = header.get("ns_backend", "ns")
    if want_ns != getattr(chain, "ns_backend", "ns"):
        raise ValueError(
            f"snapshot holds a {want_ns!r} NS-backend state; construct "
            f"the target RecordChain with ns_backend={want_ns!r}")

    # rebuild the chain's AEC state tree in the snapshot's layout before
    # unflattening: a fresh chain holds the jax layout, but a snapshot
    # taken in production TPU steady state holds the pallas layout
    want = header.get("aec_layout", "jax")
    if want != _aec_layout(chain):
        from wmix_tpu.engine import aec_pallas, aec_step
        if want == "aecm":
            raise ValueError(
                "snapshot holds an AECM-backend state; construct the "
                "target RecordChain with aec_backend='aecm'")
        aec = (aec_pallas.init_chain_aec(chain.batch, chain.part_cap)
               if want == "pallas"
               else aec_step.init_eng_state(chain.batch, chain.part_cap))
        chain.state = chain.state._replace(aec=aec)

    treedef = jax.tree_util.tree_structure(chain.state)
    old_leaves = jax.tree_util.tree_leaves(chain.state)
    if len(old_leaves) != len(leaves):
        raise ValueError(f"leaf count mismatch: snapshot {len(leaves)} "
                         f"!= chain {len(old_leaves)}")
    for x, old in zip(leaves, old_leaves):
        if tuple(x.shape) != tuple(old.shape):
            raise ValueError(f"leaf shape mismatch: snapshot "
                             f"{x.shape} != chain {old.shape}")
    new_leaves = [
        jax.numpy.asarray(x, old.dtype)
        for x, old in zip(leaves, old_leaves)]
    chain.state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    chain.play_count = header["play_count"]
    chain.tick = header["tick"]
    if header["planner"] is not None:
        if chain.planner is None:
            raise ValueError("snapshot has planner state but the chain "
                             "has no planner")
        _restore_planner(chain.planner, header["planner"])


def save(chain, path: str) -> None:
    with open(path, "wb") as f:
        f.write(snapshot(chain))


def load(chain, path: str) -> None:
    with open(path, "rb") as f:
        restore(chain, f.read())
