#!/bin/bash
# Fetch the HyperNeRF vrig scenes used by the paper from the official
# google/hypernerf v0.1 release and unpack them under $1
# (reference scripts/download_hypernerf.sh).
#
# Usage: bash scripts/download_hypernerf.sh data/hypernerf
set -u

dest=${1:?usage: download_hypernerf.sh <dest_path>}
mkdir -p "$dest"

scenes=(
  interp_chickchicken
  interp_torchocolate
  misc_americano
  misc_espresso
  misc_keyboard
  misc_split-cookie
)

base_url="https://github.com/google/hypernerf/releases/download/v0.1"
for scene in "${scenes[@]}"; do
  zip="$dest/$scene.zip"
  if [ ! -f "$zip" ]; then
    echo "downloading $scene.zip"
    if ! wget -q --show-progress "$base_url/$scene.zip" -P "$dest"; then
      echo "download failed for $scene, skipping" >&2
      continue
    fi
  fi
  if unzip -o "$zip" -d "$dest"; then
    rm "$zip"
  else
    echo "unzip failed for $scene; zip kept for inspection" >&2
  fi
done
echo "Done."
