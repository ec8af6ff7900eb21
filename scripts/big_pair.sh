#!/bin/sh
# 4x-corpus scaling pair (3072 hosts x 400 pages = 1.23M URLs, one
# big-batch superstep) - the closest in-sandbox approximation of the
# 10^10-URL design point, where the level-independent serial floor
# (~2 min of driver planning/codegen per crawl) amortizes into the
# parallel data path.  Each leg gated on its own quiet-load window
# (scripts/gated_leg.py); bloom sized up with the corpus, driver
# memory raised equally at both levels.
set -e
cd "$(dirname "$0")/.."
export BENCH_CRAWL_BITS=$((1 << 23))
export MECHAML_DRIVER_MEM=32g
Q=${Q:-3.3}
W=${W:-3600}
python scripts/gated_leg.py --cpus 2 --quiet "$Q" --max-wait "$W" \
  --hosts 3072 --pages 400 --budget 400 --out /tmp/big2.json
python scripts/gated_leg.py --cpus 8 --quiet "$Q" --max-wait "$W" \
  --hosts 3072 --pages 400 --budget 400 --out /tmp/big8.json
python - <<'EOF'
import json
lo = json.load(open("/tmp/big2.json"))
hi = json.load(open("/tmp/big8.json"))
eff = (hi["throughput"] / lo["throughput"]) / 4
print(json.dumps({"eff": round(eff, 3), "lo": lo, "hi": hi}))
EOF
