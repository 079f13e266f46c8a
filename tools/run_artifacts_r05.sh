#!/bin/bash
# Round-5 driver-artifact runner: executes every measurement harness on
# the real chip and leaves the artifacts at the repo root.  Each step is
# wall-bounded so a wedged TPU service cannot eat the round.  The two
# north-star parity configs run FIRST (VERDICT r4 next #2).
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; budget=$2; shift 2
  echo "=== $name (budget ${budget}s) ==="
  timeout -k 30 "$budget" "$@"
  echo "=== $name rc=$? ==="
}

# 1. north-star parity configs (int chain + exact dd), merged over the
#    existing artifact so the full record survives a wall-clock kill
run parity_north 5400 python parity.py --round 5 \
  --configs int_chain_nsx_aecm,full_chain_exact_dd --merge

# 2. headline bench (writes bench_lastgood.json; BENCH_r05 is emitted by
#    the driver itself, but this validates the path + warms caches)
run bench 900 env BENCH_WALL=840 python bench.py

# 3. per-tick realtime latency (thread drain is the default mode)
run realtime 2400 python realtime_bench.py --round 5 --batches 256,1024

# 4. batched play/mix engine
run mix 900 python mix_bench.py --round 5

# 5. codec throughput (native front-ends + device transforms)
run codec 1800 python codec_bench.py --round 5

# 6. remaining parity attribution configs (already recorded; re-run only
#    if the artifact lacks them)
python - <<'EOF'
import json, subprocess, sys
d = json.load(open('PARITY_r05.json'))
missing = [c for c in d.get('expected_configs', [])
           if c not in d.get('configs', {})]
if missing:
    subprocess.run([sys.executable, 'parity.py', '--round', '5',
                    '--configs', ','.join(missing), '--merge'],
                   timeout=5400)
EOF

echo "all artifacts done"
ls -la PARITY_r05.json REALTIME_r05.json MIX_r05.json CODEC_r05.json \
  bench_lastgood.json 2>/dev/null
