#!/bin/bash
# Fetch the published reference checkpoints and convert them into this
# framework's parameter format (the role of the reference's
# models/fetch_models.sh, ref models/fetch_models.sh:1-5, followed by
# scripts/convert_checkpoint.py).
#
# Requires network access to the original hosting server.
set -euo pipefail

BASE=https://people.eecs.berkeley.edu/~junyanz/projects/ideepcolor/models
OUT=${1:-./weights}
mkdir -p "$OUT/raw"

# One clean diagnostic line on failure (no curl stack spew); return 1
# (NOT exit: `fetch ... || true` marks a model optional, and exit would
# kill the whole script regardless) — under `set -e` a bare failing
# fetch still aborts, so mandatory models gate the conversion steps.
fetch() {
  [ -f "$OUT/raw/$2" ] && return 0
  if ! curl -fsSL --connect-timeout 10 --retry 2 "$BASE/$1" \
       -o "$OUT/raw/$2.part" 2>/dev/null; then
    rm -f "$OUT/raw/$2.part"
    echo "fetch failed: $BASE/$1 (server unreachable from this host)" >&2
    return 1
  fi
  mv "$OUT/raw/$2.part" "$OUT/raw/$2"
}

fetch reference_model/model.caffemodel         model.caffemodel
fetch reference_model/model_dist.caffemodel    model_dist.caffemodel || true
fetch global_model/global_model.caffemodel     global_model.caffemodel
fetch pytorch/pytorch.pth                      pytorch.pth
fetch pytorch/caffemodel.pth                   caffemodel.pth

PY=${PYTHON:-python}
$PY scripts/convert_checkpoint.py "$OUT/raw/model.caffemodel" \
    "$OUT/caffe_main.npz" --variant main
$PY scripts/convert_checkpoint.py "$OUT/raw/global_model.caffemodel" \
    "$OUT/caffe_global.npz" --variant global
$PY scripts/convert_checkpoint.py "$OUT/raw/pytorch.pth" \
    "$OUT/siggraph.npz"
$PY scripts/convert_checkpoint.py "$OUT/raw/caffemodel.pth" \
    "$OUT/siggraph_caffe_retrain.npz"

echo "converted weights in $OUT/"
