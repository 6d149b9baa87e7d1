#!/bin/bash
# Same seed twice => byte-identical embeddings
# (mirror of the reference demo/reproducibility.sh:1-14).
set -e
cd "$(dirname "$0")"
KARATE=${KARATE:-karate.edg}
OUT=${TMPDIR:-/tmp}/pecanpy_tpu_repro
mkdir -p "$OUT"

for i in 1 2; do
    python -m pecanpy_tpu.cli --input "$KARATE" --output "$OUT/run$i.emb" \
        --walk-length 10 --num-walks 3 --dimensions 16 --window-size 4 \
        --random_state 42
done

cmp "$OUT/run1.emb" "$OUT/run2.emb" && echo "reproducible: outputs identical"
