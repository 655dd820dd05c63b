#!/bin/sh
# End-of-round preflight (VERDICT r3 #2): nothing ships on a red suite
# or a silently-regressed headline.
#
#   sh scripts/preflight.sh
#
# 1. full CPU test suite (tests/conftest.py forces the virtual mesh)
# 2. multi-chip dryrun (8 virtual devices)
# 3. bench.py on the real chip — prints vs_prev_round and sets
#    "regression": true when the headline drops >10% vs the newest
#    committed BENCH_r*.json
set -e
cd "$(dirname "$0")/.."
echo "== full suite =="
python -m pytest tests/ -q
echo "== multichip dryrun =="
python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
echo "== bench (real chip) =="
python bench.py | tee /tmp/bench_preflight.json
python - <<'EOF'
import json
row = json.load(open("/tmp/bench_preflight.json"))
d = row.get("detail", {})
assert not d.get("regression"), (
    f"headline regression: {row['value']} Mrays/s is >10% below the "
    f"previous round (vs_prev_round={d.get('vs_prev_round')})"
)
print(f"preflight OK: {row['value']} Mrays/s "
      f"(vs_prev {d.get('vs_prev_round')})")
EOF
