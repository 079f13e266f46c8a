"""Full record-chain parity: the batched engine vs the C reference chain
(ns_process -> aec_process2 with the playPkgBuff far-delay quirk ->
agc_process -> vad_process, per wmix_shmem_write_circle
src/wmix.c:613-711) driven per stream through the oracle."""
import numpy as np
import pytest

from tests.conftest import requires_oracle
from tests.test_aec import _echo_scene

from wmix_tpu.engine.chain import AEC_FIFO_PKG_NUM, RecordChain
from wmix_tpu.ops import resample


pytestmark = pytest.mark.heavy


class _OracleChain:
    """One stream of the daemon record chain via the C reference."""

    def __init__(self, o, freq, agc_gain=5):
        self.freq = freq
        self.ns = o.ns(chn=1, freq=freq)
        self.aec = o.aec(chn=1, freq=freq, interval_ms=20)
        self.agc = o.agc(chn=1, freq=freq, interval_ms=20, value=agc_gain)
        self.vad = o.vad(chn=1, freq=freq, interval_ms=20)
        self.pkg = freq // 1000 * 20
        self.fifo = np.zeros((AEC_FIFO_PKG_NUM, self.pkg), np.int16)
        self.count = 0

    def step(self, mic, play):
        # playPkgBuff_add then get(400) (src/wmix.c:487-526,1461-1466)
        self.fifo[self.count] = play
        self.count = (self.count + 1) % AEC_FIFO_PKG_NUM
        c = self.count
        g = c - 400 // 20
        g = min(max(g, 0), AEC_FIFO_PKG_NUM)
        g = c - g
        g = g - AEC_FIFO_PKG_NUM if g >= AEC_FIFO_PKG_NUM else (
            g + AEC_FIFO_PKG_NUM if g < 0 else g)
        far = self.fifo[g]

        x = self.ns.process(mic)
        x = self.aec.process2(far, x, 0)
        x = self.agc.process(x)
        x = self.vad.process(x)
        return x


def _run(freq, n_pkgs, B=2):
    from oracle.bindings import Oracle
    o = Oracle()
    pkg = freq // 1000 * 20
    scenes = [_echo_scene(n_pkgs * pkg, freq, seed=s, echo_gain=g)
              for s, g in [(2, 0.5), (9, 0.8)][:B]]
    plays = np.stack([s[0] for s in scenes])
    mics = np.stack([s[1] for s in scenes])

    eng = RecordChain(B, freq)
    refs = [_OracleChain(o, freq) for _ in range(B)]

    for i in range(n_pkgs):
        sl = slice(i * pkg, (i + 1) * pkg)
        origin, pkg8k, _ = eng.step(mics[:, sl], plays[:, sl])
        origin = np.asarray(origin)
        pkg8k = np.asarray(pkg8k)
        for b in range(B):
            want = refs[b].step(mics[b, sl], plays[b, sl])
            bad = np.nonzero(origin[b].astype(np.int64) !=
                             want.astype(np.int64))[0]
            assert bad.size == 0, (
                f"pkg {i} stream {b}: {bad.size} mismatches at {bad[:5]}, "
                f"got {origin[b][bad[:3]]} want {want[bad[:3]]}")
            # the 1x8000 shared-memory feed is the zoomed origin package
            want8k = np.frombuffer(
                resample.pcm_zoom(1, freq, want.tobytes(), 1, 8000),
                np.int16)
            assert np.array_equal(pkg8k[b], want8k), f"pkg {i} zoom diff"


@requires_oracle
def test_chain_16k():
    _run(16000, n_pkgs=12)


@requires_oracle
def test_chain_8k():
    _run(8000, n_pkgs=10)


@requires_oracle
def test_chain_16k_long():
    _run(16000, n_pkgs=40, B=1)


def test_chunked_scan_matches_stepwise():
    """run_chunk (one dispatch per K packages) must equal per-package
    step() exactly — same plans, same state evolution."""
    freq, B, warm, K = 16000, 2, 4, 6
    pkg = freq // 1000 * 20
    rng = np.random.RandomState(3)
    n = (warm + K) * pkg
    mic = (rng.randn(B, n) * 3000).astype(np.int16)
    play = (rng.randn(B, n) * 5000).astype(np.int16)

    a = RecordChain(B, freq)
    b = RecordChain(B, freq)

    outs_a = []
    for i in range(warm + K):
        sl = slice(i * pkg, (i + 1) * pkg)
        o, p8, v = a.step(mic[:, sl], play[:, sl])
        outs_a.append(np.asarray(o))

    for i in range(warm):
        sl = slice(i * pkg, (i + 1) * pkg)
        b.step(mic[:, sl], play[:, sl])
    mic_c = mic[:, warm * pkg:].reshape(B, K, pkg).transpose(1, 0, 2)
    play_c = play[:, warm * pkg:].reshape(B, K, pkg).transpose(1, 0, 2)
    origin, _, _ = b.run_chunk(mic_c, play_c)
    origin = np.asarray(origin)

    for k in range(K):
        assert np.array_equal(origin[k], outs_a[warm + k]), f"chunk pkg {k}"


def test_chunked_scan_8k_alternating_signatures():
    """At 8 kHz the AEC plan alternates between two signatures;
    run_chunk must group runs and still match stepwise exactly."""
    freq, B, warm, K = 8000, 2, 6, 6
    pkg = freq // 1000 * 20
    rng = np.random.RandomState(5)
    n = (warm + K) * pkg
    mic = (rng.randn(B, n) * 3000).astype(np.int16)
    play = (rng.randn(B, n) * 5000).astype(np.int16)
    a = RecordChain(B, freq)
    b = RecordChain(B, freq)
    outs_a = []
    for i in range(warm + K):
        sl = slice(i * pkg, (i + 1) * pkg)
        o, _, _ = a.step(mic[:, sl], play[:, sl])
        outs_a.append(np.asarray(o))
    for i in range(warm):
        sl = slice(i * pkg, (i + 1) * pkg)
        b.step(mic[:, sl], play[:, sl])
    mic_c = mic[:, warm * pkg:].reshape(B, K, pkg).transpose(1, 0, 2)
    play_c = play[:, warm * pkg:].reshape(B, K, pkg).transpose(1, 0, 2)
    origin, _, _ = b.run_chunk(mic_c, play_c)
    origin = np.asarray(origin)
    for k in range(K):
        assert np.array_equal(origin[k], outs_a[warm + k]), f"pkg {k}"


def test_chain_32k_ns_agc_vad():
    """32 kHz record chain: AEC is rate-gated off (wmix.c:633), the
    rest of the chain runs."""
    freq, B = 32000, 2
    pkg = freq // 1000 * 20
    rng = np.random.RandomState(6)
    c = RecordChain(B, freq)
    assert c.planner is None
    mic = (rng.randn(B, pkg) * 3000).astype(np.int16)
    play = (rng.randn(B, pkg) * 3000).astype(np.int16)
    o, p8, v = c.step(mic, play)
    assert np.asarray(o).shape == (B, pkg)
    assert np.asarray(p8).shape == (B, 160)   # 20 ms at 1x8000


def test_sharded_chain_matches_monolithic():
    """ShardedRecordChain (the B>=4096 compile-size escape hatch) must
    produce bitwise-identical streams to one monolithic chain: shard
    planners run the same deterministic tick sequence, and each stream's
    state never crosses shards."""
    from wmix_tpu.engine.chain import ShardedRecordChain
    freq, B, K = 16000, 4, 6
    pkg = freq // 1000 * 20
    rng = np.random.RandomState(7)
    mic_c = (rng.randn(K, B, pkg) * 3000).astype(np.int16)
    play_c = (rng.randn(K, B, pkg) * 5000).astype(np.int16)
    mono = RecordChain(B, freq)
    shard = ShardedRecordChain(B, freq, shards=2)
    o1, p1, v1 = (np.asarray(x) for x in mono.run_chunk(mic_c, play_c))
    o2, p2, v2 = (np.asarray(x) for x in shard.run_chunk(mic_c, play_c))
    assert np.array_equal(o1, o2)
    assert np.array_equal(p1, p2)
    assert np.array_equal(v1, v2)
    # second chunk: carried state stays aligned
    o1b = np.asarray(mono.run_chunk(mic_c, play_c)[0])
    o2b = np.asarray(shard.run_chunk(mic_c, play_c)[0])
    assert np.array_equal(o1b, o2b)
    # slot reset addressing maps into the right shard
    shard.reset_slots([0, 3])
