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
    for k, v in snap.items():
        if isinstance(v, dict) and v.get("__ring__"):
            ring = getattr(p, k)
            assert ring.count == v["count"], f"ring {k} geometry mismatch"
            ring.r, ring.w = v["r"], v["w"]
        else:
            setattr(p, k, v)


def snapshot(chain) -> bytes:
    """Serialize a RecordChain's full streaming state to bytes."""
    leaves = jax.tree_util.tree_leaves(chain.state)
    header = {
        "batch": chain.batch,
        "freq": chain.freq,
        "flags": list(chain.flags),
        "agc_gain_db": chain.agc_gain_db,
        "part_cap": chain.part_cap,
        "play_count": chain.play_count,
        "tick": chain.tick,
        "planner": _planner_state(chain.planner) if chain.planner
        else None,
        "n_leaves": len(leaves),
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

    assert header["batch"] == chain.batch, "batch mismatch"
    assert header["freq"] == chain.freq, "freq mismatch"
    assert tuple(header["flags"]) == tuple(chain.flags), "flags mismatch"
    assert header["part_cap"] == chain.part_cap, "part_cap mismatch"

    treedef = jax.tree_util.tree_structure(chain.state)
    old_leaves = jax.tree_util.tree_leaves(chain.state)
    assert len(old_leaves) == len(leaves)
    new_leaves = [
        jax.numpy.asarray(x, old.dtype)
        for x, old in zip(leaves, old_leaves)]
    chain.state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    chain.play_count = header["play_count"]
    chain.tick = header["tick"]
    if header["planner"] is not None:
        assert chain.planner is not None, "planner presence mismatch"
        _restore_planner(chain.planner, header["planner"])


def save(chain, path: str) -> None:
    with open(path, "wb") as f:
        f.write(snapshot(chain))


def load(chain, path: str) -> None:
    with open(path, "rb") as f:
        restore(chain, f.read())
