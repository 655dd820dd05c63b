#!/bin/sh
# End-of-round preflight (VERDICT r3 #2, r4 #7): nothing ships on a red
# suite or a silently-regressed headline, and the run is recorded as a
# committed artifact (PREFLIGHT_r05.txt) so green-at-HEAD is verifiable
# without a full re-run.
#
#   sh scripts/preflight.sh
#
# 1. CORE test tier (pytest -m 'not slow', < ~2 min)
# 2. FULL suite (adds the compile-heavy slow tier)
# 3. multi-chip dryrun (8 virtual devices)
# 4. bench.py on the real chip — vs_prev_round gates the headline
#    (>10% drop) and the live row (>10% frame-time growth)
set -e
cd "$(dirname "$0")/.."
LOG=PREFLIGHT_r05.txt
: > "$LOG"
echo "== preflight $(date -u +%Y-%m-%dT%H:%M:%SZ) @ $(git rev-parse --short HEAD) ==" | tee -a "$LOG"
echo "== core tier ==" | tee -a "$LOG"
python -m pytest tests/ -m "not slow" -q 2>&1 | tail -3 | tee -a "$LOG"
echo "== full suite ==" | tee -a "$LOG"
python -m pytest tests/ -q 2>&1 | tail -3 | tee -a "$LOG"
echo "== multichip dryrun ==" | tee -a "$LOG"
python -c "import __graft_entry__ as g; g.dryrun_multichip(8)" 2>&1 | tail -2 | tee -a "$LOG"
echo "== bench (real chip) ==" | tee -a "$LOG"
python bench.py | tee /tmp/bench_preflight.json
tail -1 /tmp/bench_preflight.json >> "$LOG"
python - <<'EOF' | tee -a "$LOG"
import json
row = json.load(open("/tmp/bench_preflight.json"))
d = row.get("detail", {})
assert not d.get("regression"), (
    f"headline regression: {row['value']} Mrays/s is >10% below the "
    f"previous round (vs_prev_round={d.get('vs_prev_round')})"
)
live = d.get("live_scale", {})
assert not live.get("regression"), (
    f"live-map regression: {live.get('frame_ms')} ms/frame is >10% "
    f"above the previous round"
)
print(f"preflight OK: {row['value']} Mrays/s "
      f"(vs_prev {d.get('vs_prev_round')}); "
      f"live {live.get('frame_ms')} ms/frame")
EOF
