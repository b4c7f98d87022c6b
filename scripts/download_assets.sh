#!/usr/bin/env bash
# Fetch the published SNIPER assets (ImageNet/OpenImages pretrained
# backbones, trained detector checkpoints, precomputed negative-chip
# proposals) and verify they parse with this repo's MXNet-free .params
# reader. Counterpart of the reference download_* scripts
# (/root/reference/scripts/download_pretrained_models.sh etc. — same
# published tarballs, linked from the SNIPER README).
#
# Usage:  scripts/download_assets.sh [pretrained|detectors|proposals|all]
#
# In an egress-less environment this exits 2 after printing the URLs so
# callers can fetch elsewhere and drop the files into data/.
set -euo pipefail

here="$(cd "$(dirname "$0")/.." && pwd)"
data="$here/data"
mkdir -p "$data"

declare -A urls=(
  [pretrained]="https://bit.ly/2WgSJ6b"   # pretrained_model.tar.gz -> data/
  [detectors]="https://bit.ly/3j6mAXJ"    # sniper_models.tar.gz -> repo root
  [proposals]="https://bit.ly/3j8SOl7"    # proposals.tar.gz -> data/
)
declare -A dests=(
  [pretrained]="$data"
  [detectors]="$here"
  [proposals]="$data"
)

fetch() {
  local key="$1" url="${urls[$1]}" dest="${dests[$1]}"
  local tarball="$dest/$key.tar.gz"
  if ! curl -fsSL --connect-timeout 10 -A "sniper-tpu $(date +%s)" \
       "$url" --output "$tarball"; then
    echo "No network egress. Fetch manually and extract into $dest:" >&2
    echo "  $url" >&2
    return 2
  fi
  tar -xzf "$tarball" -C "$dest"
  rm -f "$tarball"
  # verify every .params file parses with the no-mxnet reader
  find "$dest" -name '*.params' -newer "$here/scripts/download_assets.sh" \
    -print0 2>/dev/null | while IFS= read -r -d '' f; do
    python - "$f" <<'PY'
import sys
from sniper_tpu.train.pretrained import read_mxnet_params
flat = read_mxnet_params(sys.argv[1])
print(f"{sys.argv[1]}: {len(flat)} tensors ok")
PY
  done
}

what="${1:-all}"
if [ "$what" = "all" ]; then
  for k in pretrained detectors proposals; do fetch "$k"; done
else
  fetch "$what"
fi
