"""Production-path parity measurement vs the C reference (PARITY_r0N.json).

The north-star metric couples throughput WITH parity ("PCM parity <= 1
LSB", BASELINE.json).  Bit-exactness is proven for the exact mode
(CPU/x64, tests/test_engine_chain.py); the benched production path is
fast-mode float32 + the Pallas AEC kernel, whose deviation was only
statistically gated (VERDICT r2 weak #1).  This harness measures the
actual LSB-error distribution of the production chain against the
compiled C reference chain (oracle/bindings.py) over long streams:

  * headline: full NS+AEC+AGC+VAD chain, B streams x `seconds` s of
    audio, per-stream scene variety (echo/no-echo/far-talk/silence,
    varying echo gains and seeds) — max/p99.9/mean |err| in LSB,
    fraction exact, fraction within 1 LSB, and max-|err| per time
    window (drift-over-time);
  * attribution: the same measurement per stage (NS-only, AEC-only,
    AGC-only, VAD-only) and with the pallas kernel forced off
    (WMIX_PALLAS=0 fast-jax path), so error concentrations are
    localizable to a stage and to kernel-vs-float-mode.

Reference call chain mirrored: wmix_shmem_write_circle
(/root/reference/src/wmix.c:528-872) — NS -> AEC(far = playPkgBuff 400 ms
delay) -> AGC -> VAD, mono packages of 20 ms.

Usage:  python parity.py [--round N] [--quick]
Writes PARITY_r0N.json at the repo root and prints a summary.

The C-oracle outputs are deterministic; they are cached under
``.parity_cache/`` so TPU-side iterations do not re-run the C chain.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
_CACHE = os.path.join(_REPO, ".parity_cache")

AEC_FIFO_PKG_NUM = 22      # src/wmixConf.h:141
AEC_DELAY_PKGS = 400 // 20  # platform/alsa/plat.h:19


# ------------------------------------------------------------------ scenes

def make_scene(n: int, freq: int, kind: str, seed: int,
               echo_gain: float) -> tuple[np.ndarray, np.ndarray]:
    """(play, mic) int16 streams for one stream slot.

    Scene shapes follow the reference's AEC debug methodology
    (AEC_FILE_STREAM_TEST, src/wmix.c:1388-1418: known signal injected as
    synthetic echo)."""
    r = np.random.RandomState(seed)
    t = np.arange(n) / freq
    far = (np.sin(2 * np.pi * (300 + 40 * (seed % 7)) * t) * 6000 +
           np.sin(2 * np.pi * (170 + 23 * (seed % 5)) * t) * 3000 *
           (np.sin(2 * np.pi * 1.3 * t + seed) > 0))
    speech = (np.sin(2 * np.pi * (220 + 31 * (seed % 3)) * t) * 4000 *
              (np.sin(2 * np.pi * 0.7 * t + seed * 0.7) > 0.3))
    noise = r.randn(n) * 80
    delay = freq // 100 + (seed % 3) * 16   # ~10 ms echo path
    echo = np.zeros(n)
    echo[delay:] = far[:n - delay] * echo_gain

    if kind == "echo":            # duplex: echo + local speech
        play, mic = far, echo + speech + noise
    elif kind == "fartalk":       # far-end only: pure echo + noise
        play, mic = far, echo + noise
    elif kind == "noecho":        # local speech only, far silent
        play, mic = np.zeros(n), speech + noise
    elif kind == "silence":       # idle room
        play, mic = np.zeros(n), noise
    else:
        raise ValueError(kind)
    clip = lambda x: np.clip(x, -32768, 32767).astype(np.int16)
    return clip(play), clip(mic)


def build_streams(batch: int, n: int, freq: int):
    kinds = ("echo", "fartalk", "noecho", "silence")
    gains = (0.3, 0.5, 0.7, 0.9)
    plays = np.zeros((batch, n), np.int16)
    mics = np.zeros((batch, n), np.int16)
    meta = []
    for b in range(batch):
        kind = kinds[b % len(kinds)]
        gain = gains[(b // len(kinds)) % len(gains)]
        plays[b], mics[b] = make_scene(n, freq, kind, seed=b,
                                       echo_gain=gain)
        meta.append({"kind": kind, "gain": gain, "seed": b})
    return plays, mics, meta


# ------------------------------------------------------------------ oracle

class OracleChain:
    """One stream of the daemon record chain via the compiled reference,
    with per-module enables mirroring wmix->webrtcEnable."""

    def __init__(self, o, freq, flags, agc_gain=5):  # noqa: D401
        ns_on, aec_on, agc_on, vad_on = flags
        self.ns = o.ns(chn=1, freq=freq) if ns_on else None
        self.aec = o.aec(chn=1, freq=freq, interval_ms=20) \
            if aec_on else None
        self.agc = o.agc(chn=1, freq=freq, interval_ms=20,
                         value=agc_gain) if agc_on else None
        self.vad = o.vad(chn=1, freq=freq, interval_ms=20) \
            if vad_on else None
        self.pkg = freq // 1000 * 20
        self.fifo = np.zeros((AEC_FIFO_PKG_NUM, self.pkg), np.int16)
        self.count = 0

    def step(self, mic, play):
        # playPkgBuff_add then get(400) (src/wmix.c:487-526,1461-1466)
        self.fifo[self.count] = play
        self.count = (self.count + 1) % AEC_FIFO_PKG_NUM
        c = self.count
        g = c - AEC_DELAY_PKGS
        g = min(max(g, 0), AEC_FIFO_PKG_NUM)
        g = c - g
        g = g - AEC_FIFO_PKG_NUM if g >= AEC_FIFO_PKG_NUM else (
            g + AEC_FIFO_PKG_NUM if g < 0 else g)
        far = self.fifo[g]
        x = mic
        if self.ns is not None:
            x = self.ns.process(x)
        if self.aec is not None:
            x = self.aec.process2(far, x, 0)
        if self.agc is not None:
            x = self.agc.process(x)
        if self.vad is not None:
            x = self.vad.process(x)
        return x


def oracle_outputs(plays, mics, freq, flags,
                   variant: str = "") -> np.ndarray:
    """[B, n] int16 reference outputs, cached on disk (deterministic)."""
    key = hashlib.sha256()
    key.update(np.ascontiguousarray(plays).tobytes())
    key.update(np.ascontiguousarray(mics).tobytes())
    key.update(f"{freq}:{flags}:{variant}:v1".encode())
    path = os.path.join(_CACHE, f"oracle_{key.hexdigest()[:24]}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return z["out"]
    from oracle.bindings import Oracle
    o = Oracle(variant=variant)
    B, n = mics.shape
    pkg = freq // 1000 * 20
    out = np.zeros_like(mics)
    t0 = time.time()
    for b in range(B):
        ref = OracleChain(o, freq, flags)
        for i in range(0, n, pkg):
            out[b, i:i + pkg] = ref.step(mics[b, i:i + pkg],
                                         plays[b, i:i + pkg])
        if b % 16 == 15:
            print(f"  oracle: {b + 1}/{B} streams "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr)
    os.makedirs(_CACHE, exist_ok=True)
    np.savez_compressed(path, out=out)
    return out


# ------------------------------------------------------------------ engine

def engine_outputs(plays, mics, freq, flags, chunk_pkgs=50,
                   ns_backend="ns", aec_backend="aec") -> np.ndarray:
    """[B, n] int16 production-chain outputs (fast mode; pallas per
    WMIX_PALLAS / backend default)."""
    import jax
    from wmix_tpu.engine.chain import RecordChain
    B, n = mics.shape
    pkg = freq // 1000 * 20
    n_pkgs = n // pkg
    ns_on, aec_on, agc_on, vad_on = flags
    chain = RecordChain(B, freq, ns_enable=ns_on, aec_enable=aec_on,
                        agc_enable=agc_on, vad_enable=vad_on,
                        ns_backend=ns_backend, aec_backend=aec_backend)
    out = np.zeros_like(mics)
    mic_k = np.transpose(
        mics[:, :n_pkgs * pkg].reshape(B, n_pkgs, pkg), (1, 0, 2))
    play_k = np.transpose(
        plays[:, :n_pkgs * pkg].reshape(B, n_pkgs, pkg), (1, 0, 2))
    for i in range(0, n_pkgs, chunk_pkgs):
        k = min(chunk_pkgs, n_pkgs - i)
        origin, _, _ = chain.run_chunk(mic_k[i:i + k], play_k[i:i + k])
        origin = np.asarray(origin)          # [k, B, pkg]
        out[:, i * pkg:(i + k) * pkg] = np.transpose(
            origin, (1, 0, 2)).reshape(B, k * pkg)
    return out


# ------------------------------------------------------------------ stats

def error_stats(got: np.ndarray, want: np.ndarray, freq: int,
                n_windows: int = 10) -> dict:
    g = got.astype(np.int64)
    w = want.astype(np.int64)
    err = np.abs(g - w)
    denom = float(np.sqrt(np.mean(g.astype(np.float64) ** 2) *
                          np.mean(w.astype(np.float64) ** 2))) + 1e-9
    corr = float(np.mean(g.astype(np.float64) * w.astype(np.float64))
                 / denom)
    n = err.shape[1]
    wlen = n // n_windows
    win_max = [int(err[:, i * wlen:(i + 1) * wlen].max())
               for i in range(n_windows)]
    flat = err.ravel()
    return {
        "samples": int(flat.size),
        "max_lsb": int(flat.max()),
        "p999_lsb": int(np.percentile(flat, 99.9)),
        "p99_lsb": int(np.percentile(flat, 99)),
        "mean_lsb": round(float(flat.mean()), 5),
        "pct_exact": round(float(np.mean(flat == 0) * 100), 3),
        "pct_within_1lsb": round(float(np.mean(flat <= 1) * 100), 3),
        "pct_within_4lsb": round(float(np.mean(flat <= 4) * 100), 3),
        "corr": round(corr, 6),
        "window_max_lsb": win_max,
        "per_stream_max_lsb": [int(x) for x in err.max(axis=1)],
    }


# ------------------------------------------------------------------ main

FULL = (True, True, True, True)
STAGES = {
    "ns_only": (True, False, False, False),
    "aec_only": (False, True, False, False),
    "agc_only": (False, False, True, False),
    "vad_only": (False, False, False, True),
}


def run(round_no: int, quick: bool, save=None, only=None,
        base=None) -> dict:
    """only: restrict to a set of config names (None = all).
    base: prior artifact dict to merge into — configs re-measured here
    replace the old entries; everything else (other configs, analysis)
    is preserved, so a targeted re-measurement keeps the full record."""
    freq = 16000
    if quick:
        B, seconds = 8, 10
        stage_b, stage_s = 4, 5
    else:
        B, seconds = 64, 60
        stage_b, stage_s = 8, 30
    pkg = freq // 1000 * 20
    n = seconds * freq

    import jax
    backend = jax.default_backend()
    from wmix_tpu.dsp import floatops
    from wmix_tpu.engine.aec_pallas import pallas_enabled

    from oracle import bindings as _ob
    expected = ["full_chain"]
    if _ob.available(1, freq, "intdsp"):
        expected.append("int_chain_nsx_aecm")
    if not jax.config.jax_enable_x64:
        expected.append("full_chain_exact_dd")
    if pallas_enabled(freq):
        expected += ["full_chain_no_pallas", "pallas_vs_jaxfast"]
    expected += list(STAGES)

    result = {
        "metric": "production_chain_lsb_error_vs_c_reference",
        "freq": freq,
        "backend": backend,
        "fast_mode": floatops.fast_mode(),
        "pallas": pallas_enabled(freq),
        "batch": B,
        "seconds": seconds,
        # a killed run leaves complete=False with the configs measured so
        # far; skipped-by-environment configs are visible as the
        # difference between expected_configs and configs (ADVICE r4)
        "complete": False,
        "expected_configs": expected,
        "configs": {},
    }
    if base:
        # targeted re-measurement: start from the prior artifact so
        # configs not in `only` (and the analysis narrative) survive
        result["configs"] = dict(base.get("configs", {}))
        if "analysis" in base:
            result["analysis"] = base["analysis"]

    def want_cfg(name: str) -> bool:
        return only is None or name in only

    def _checkpoint():
        # stream the artifact to disk config by config so a wall-clock
        # kill still leaves a valid PARITY file (the round-3 lesson:
        # all-or-nothing measurement runs record nothing when killed)
        if save is not None:
            save(result)

    plays, mics, meta = build_streams(B, n, freq)
    result["scenes"] = meta

    # North-star config #1, measured FIRST so a wall-clock kill cannot
    # lose it again (VERDICT r4 next #1/#2): the EXACT serving mode —
    # full chain with the integer NSX + AECM backends (the reference's
    # src/webrtc.c:173,512 switches), int32 arithmetic end to end, so
    # TPU == C bitwise.
    if _ob.available(1, freq, "intdsp") and \
            want_cfg("int_chain_nsx_aecm"):
        print(f"[parity] int chain (NSX+AECM): B={B}, {seconds}s",
              file=sys.stderr)
        want_i = oracle_outputs(plays, mics, freq, FULL, variant="intdsp")
        got_i = engine_outputs(plays, mics, freq, FULL,
                               ns_backend="nsx", aec_backend="aecm")
        result["configs"]["int_chain_nsx_aecm"] = error_stats(
            got_i, want_i, freq)
        _checkpoint()
    else:
        print("[parity] intdsp oracle missing — run "
              "oracle/build_oracle.sh", file=sys.stderr)

    want = None
    if only is None or {"full_chain", "full_chain_exact_dd",
                        "full_chain_no_pallas",
                        "pallas_vs_jaxfast"} & only:
        want = oracle_outputs(plays, mics, freq, FULL)

    # North-star config #2: the float EXACT mode without hardware f64.
    # WMIX_EXACT=1 keeps the guarded f32 forms and routes
    # transcendentals through the double-float emulation
    # (dsp/ddmath.py) — the TPU answer to the reference's
    # (float)(double op) libm calls (VERDICT r3 next #3).  Pallas
    # auto-disables under exact mode (aec_pallas.pallas_enabled).
    if not jax.config.jax_enable_x64 and want_cfg("full_chain_exact_dd"):
        os.environ["WMIX_EXACT"] = "1"
        try:
            print("[parity] full chain, WMIX_EXACT=1 "
                  "(dd transcendentals)", file=sys.stderr)
            got_e = engine_outputs(plays, mics, freq, FULL)
            result["configs"]["full_chain_exact_dd"] = \
                error_stats(got_e, want, freq)
        finally:
            del os.environ["WMIX_EXACT"]
        _checkpoint()

    # headline: full chain, production path
    got = None
    if want_cfg("full_chain"):
        print(f"[parity] full chain: B={B}, {seconds}s, "
              f"backend={backend}, pallas={result['pallas']}",
              file=sys.stderr)
        got = engine_outputs(plays, mics, freq, FULL)
        result["configs"]["full_chain"] = error_stats(got, want, freq)
        _checkpoint()

    # attribution A: pallas off (fast-jax AEC path), same inputs
    if result["pallas"] and got is not None and \
            want_cfg("full_chain_no_pallas"):
        os.environ["WMIX_PALLAS"] = "0"
        try:
            print("[parity] full chain, WMIX_PALLAS=0", file=sys.stderr)
            got2 = engine_outputs(plays, mics, freq, FULL)
            result["configs"]["full_chain_no_pallas"] = \
                error_stats(got2, want, freq)
            result["configs"]["pallas_vs_jaxfast"] = \
                error_stats(got, got2, freq)
        finally:
            del os.environ["WMIX_PALLAS"]
        _checkpoint()

    # attribution B: per-stage isolation
    stage_names = [nm for nm in STAGES if want_cfg(nm)]
    if stage_names:
        ns2 = stage_s * freq
        p2, m2, _ = build_streams(stage_b, ns2, freq)
    for name in stage_names:
        flags = STAGES[name]
        print(f"[parity] stage {name}: B={stage_b}, {stage_s}s",
              file=sys.stderr)
        w = oracle_outputs(p2, m2, freq, flags)
        g = engine_outputs(p2, m2, freq, flags)
        result["configs"][name] = error_stats(g, w, freq)
        _checkpoint()

    # a targeted (--configs) run is complete only if it started from a
    # complete base artifact — it measured a subset by design
    result["complete"] = only is None or bool(base and
                                              base.get("complete"))
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    # --round is required so a bare invocation cannot silently clobber a
    # prior round's artifact via os.replace (ADVICE r4)
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--configs", default=None,
                    help="comma list: re-measure only these configs")
    ap.add_argument("--merge", action="store_true",
                    help="merge into the existing artifact (keep "
                         "configs not re-measured and the analysis)")
    args = ap.parse_args()
    out = args.out or os.path.join(
        _REPO, f"PARITY_r{args.round:02d}.json")
    only = set(args.configs.split(",")) if args.configs else None
    base = None
    if args.merge and os.path.exists(out):
        with open(out) as f:
            base = json.load(f)

    def save(result: dict) -> None:
        tmp = out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(result, f, indent=1)
        os.replace(tmp, out)

    result = run(args.round, args.quick, save=save, only=only,
                 base=base)
    save(result)
    full = result["configs"].get("full_chain")
    head = (f"max |err| {full['max_lsb']} LSB, "
            f"p99.9 {full['p999_lsb']} LSB, "
            f"{full['pct_within_1lsb']}% within 1 LSB" if full
            else f"configs: {sorted(result['configs'])}")
    print(json.dumps({"headline": head, "out": out}))


if __name__ == "__main__":
    main()
