#!/bin/bash
# Round-4 driver-artifact runner: executes every measurement harness on
# the real chip and leaves the artifacts at the repo root.  Each step is
# wall-bounded so a wedged TPU service cannot eat the round.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; budget=$2; shift 2
  echo "=== $name (budget ${budget}s) ==="
  timeout -k 30 "$budget" "$@"
  echo "=== $name rc=$? ==="
}

# 1. headline bench (writes bench_lastgood.json; BENCH_r04 is emitted by
#    the driver itself, but this validates the path + warms caches)
run bench 900 env BENCH_WALL=840 python bench.py

# 2. production-chain parity incl. the integer NSX+AECM exact mode
run parity 7200 python parity.py --round 4

# 3. per-tick realtime latency
run realtime 1800 python realtime_bench.py --round 4

# 4. batched play/mix engine
run mix 900 python mix_bench.py --round 4

# 5. codec throughput (native front-ends + device transforms)
run codec 1800 python codec_bench.py --round 4

echo "all artifacts done"
ls -la PARITY_r04.json REALTIME_r04.json MIX_r04.json CODEC_r04.json \
  bench_lastgood.json 2>/dev/null
