#!/bin/bash
# Round-5 measurement battery (VERDICT r4 next-round items #1-#6).
# Each bench.py invocation prints ONE JSON line on stdout -> the artifact
# file; stderr (recall/memory/progress) goes to a per-run log.  Runs are
# ordered by evidence value; a failed run does not stop later ones.
#
# Usage: bash tools/measure_r5.sh [artifacts_dir]
set -u
cd "$(dirname "$0")/.."
ART=${1:-artifacts}
mkdir -p "$ART" /tmp/r5logs
CACHE=.benchcache

# Abort outright if the device tunnel is not serving: every artifact
# below must be a real TPU measurement (bench.py would otherwise fall
# back to the CPU backend and record platform="cpu").
plat=$(timeout 180 python -c "
from vectorchord_bm25_tpu.utils.backend import probe_backend
print(probe_backend(use_cache=False))" 2>/dev/null | tail -1)
if [ "$plat" != "tpu" ]; then
  echo "=== backend probe: '$plat' (want tpu) — aborting" >&2
  exit 1
fi

run() { # run <name> <timeout_s> <args...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s)" >&2
  timeout "$tmo" python "$@" \
    > "$ART/$name.json.tmp" 2> "/tmp/r5logs/$name.log"
  local rc=$?
  if [ $rc -eq 0 ] && [ -s "$ART/$name.json.tmp" ]; then
    mv "$ART/$name.json.tmp" "$ART/$name.json"
    echo "=== $name OK: $(cat "$ART/$name.json")" >&2
  else
    rm -f "$ART/$name.json.tmp"
    echo "=== $name FAILED rc=$rc (log: /tmp/r5logs/$name.log)" >&2
  fi
}

# 0. Roofline (VERDICT #3) — text output, not a JSON artifact.
echo "=== roofline" >&2
timeout 3600 python tools/roofline.py \
  --docs 131072 1048576 4194304 8388608 --cache $CACHE \
  > "$ART/roofline_r05.txt.tmp" 2> /tmp/r5logs/roofline.log \
  && mv "$ART/roofline_r05.txt.tmp" "$ART/roofline_r05.txt" \
  && cat "$ART/roofline_r05.txt" >&2 \
  || echo "=== roofline FAILED" >&2

# 1. Heavy mix at 8.4M: pruned vs exhaustive vs router (VERDICT #1).
HV="--docs 8388608 --queries 2048 --batch 512 --rounds 3 --query-mix heavy --cache $CACHE"
run bench_8m_sparse_heavy_r05   7200 bench.py $HV --strategy sparse
run bench_8m_maxscore_heavy_r05 7200 bench.py $HV --strategy maxscore
run bench_8m_auto_heavy_r05     7200 bench.py $HV --strategy auto

# 2. Regenerate the 8.4M informative artifacts with warmed buckets
#    (VERDICT #5 / weak #2).
IN="--docs 8388608 --queries 4096 --batch 512 --rounds 5 --cache $CACHE"
run bench_8m_sparse_r05   7200 bench.py $IN --strategy sparse
run bench_8m_maxscore_r05 9000 bench.py $IN --strategy maxscore

# 3. k=1000 north-star operating point (VERDICT weak #4).
K1="--docs 8388608 --queries 2048 --batch 512 --rounds 3 --k 1000 --cache $CACHE"
run bench_8m_sparse_k1000_r05   7200 bench.py $K1 --strategy sparse
run bench_8m_auto_k1000_heavy_r05 9000 bench.py $K1 --strategy auto --query-mix heavy

# 4. README measured-table rows (VERDICT #4).
run bench_4m_r05   5400 bench.py --docs 4194304 --queries 4096 --batch 2048 \
  --rounds 5 --cache $CACHE
run bench_1m_stream_r05 3600 bench.py --docs 1048576 --queries 4096 \
  --batch 2048 --rounds 5 --cache $CACHE
run bench_131k_r05 3600 bench.py --docs 131072 --queries 4096 --batch 4096 \
  --rounds 5 --cache $CACHE

# 5. Growing-interleave TPU numbers (VERDICT #6).
run bench_131k_growing_r05 3600 bench.py --docs 131072 --queries 4096 \
  --batch 4096 --rounds 3 --growing 2048 --growing-interleave 8 --cache $CACHE
run bench_1m_growing_r05 5400 bench.py --docs 1048576 --queries 4096 \
  --batch 2048 --rounds 3 --growing 2048 --growing-interleave 8 --cache $CACHE

# 6. Dataset-mode quality artifact on TPU (VERDICT #2).
run bench_msmarco1m_r05 10800 bench.py --dataset synthetic:msmarco-1m \
  --cache $CACHE --k 10 --batch 1024

echo "=== measure_r5 done" >&2
