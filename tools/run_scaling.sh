#!/usr/bin/env bash
# Two-cluster-size scaling protocol (BASELINE.md):
#   identical job, identical input, spark-submit --py-files, at
#   N = local[8] (shuffle 64) and 4N = local[32] (shuffle 256),
#   one discarded warm-up, then a measured run each.
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-0.1}"
OUT="${2:-/tmp/scaling_results.jsonl}"
WORK=$(mktemp -d /tmp/sparkclone-scaling-XXXX)

# build the --py-files zip
ZIP=$(PYTHONPATH=src python -c "from sparkclone.runtime import package_zip; print(package_zip())")

# synthesize the corpus once (deterministic, scale ~ sf)
PYTHONPATH=src python - "$SF" "$WORK" <<'EOF'
import sys
from sparkclone.corpus import generate_corpus_rows, rows_to_parquet
sf, work = float(sys.argv[1]), sys.argv[2]
rows = generate_corpus_rows(seed=42, n_repos=max(20, int(4000 * sf)), files_per_repo=10)
rows_to_parquet(rows, f"{work}/corpus.parquet")
print(f"corpus: {len(rows)} files -> {work}/corpus.parquet")
EOF

: > "$OUT"
run () {
  local cores=$1 shuffle=$2 tag=$3 sink=$4
  PYTHONPATH=src spark-submit \
    --master "local[$cores]" \
    --conf spark.sql.shuffle.partitions="$shuffle" \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.driver.memory=48g \
    --conf spark.ui.enabled=false \
    --py-files "$ZIP" \
    tools/bench_scaling.py "$WORK/corpus.parquet" - "$sink" \
    2>/dev/null | tail -1
}

echo "== warm-up (discarded) =="
run 8 64 warmup /dev/null
echo "== N = local[8] =="
run 8 64 n8 "$OUT"
echo "== 4N = local[32] =="
run 32 256 n32 "$OUT"

python - "$OUT" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
by = {r["cores"]: r for r in rows}
t8, t32 = by[8]["wall_s"], by[32]["wall_s"]
eff = (t8 / t32) / 4
print(f"\nN=8:  {t8:.1f}s  ({by[8]['files_per_sec']:.1f} files/s)")
print(f"4N=32: {t32:.1f}s  ({by[32]['files_per_sec']:.1f} files/s)")
print(f"scaling efficiency (T_8/T_32)/4 = {eff:.3f}")
EOF
