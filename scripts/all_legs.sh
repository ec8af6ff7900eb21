#!/bin/sh
# Full scaling-evidence chain, each leg gated on a quiet-load window:
#   1. standard pair (768x400, the BENCH.md headline corpus) at HEAD
#   2. 4x pair (3072x400) - design-point amortization evidence
# Outputs: /tmp/std{2,8}.json, /tmp/big{2,8}.json
set -e
cd "$(dirname "$0")/.."
Q=${Q:-3.3}
W=${W:-3600}
python scripts/gated_leg.py --cpus 2 --quiet "$Q" --max-wait "$W" \
  --hosts 768 --pages 400 --budget 400 --out /tmp/std2.json
python scripts/gated_leg.py --cpus 8 --quiet "$Q" --max-wait "$W" \
  --hosts 768 --pages 400 --budget 400 --out /tmp/std8.json
BENCH_CRAWL_BITS=$((1 << 23)) MECHAML_DRIVER_MEM=32g \
python scripts/gated_leg.py --cpus 2 --quiet "$Q" --max-wait "$W" \
  --hosts 3072 --pages 400 --budget 400 --out /tmp/big2.json
BENCH_CRAWL_BITS=$((1 << 23)) MECHAML_DRIVER_MEM=32g \
python scripts/gated_leg.py --cpus 8 --quiet "$Q" --max-wait "$W" \
  --hosts 3072 --pages 400 --budget 400 --out /tmp/big8.json
python - <<'EOF'
import json
for tag in ("std", "big"):
    lo = json.load(open(f"/tmp/{tag}2.json"))
    hi = json.load(open(f"/tmp/{tag}8.json"))
    eff = (hi["throughput"] / lo["throughput"]) / 4
    print(tag, "eff", round(eff, 3), "lo", lo["throughput"], "hi", hi["throughput"])
EOF
