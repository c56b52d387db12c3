#!/bin/bash
# Fetch the Neu3D / Neural 3D Video scenes from the official
# facebookresearch release, unpack, repair the split flame_salmon_1 archive,
# and extract per-camera frames (reference scripts/download_neu3d.sh; frame
# extraction via preprocess/preprocess_neu3d.py).
#
# Usage: bash scripts/download_neu3d.sh data/neu3d
set -u

dest=${1:?usage: download_neu3d.sh <dest_path>}
mkdir -p "$dest"

base_url="https://github.com/facebookresearch/Neural_3D_Video/releases/download/v1.0"
for f in coffee_martini.zip cook_spinach.zip cut_roasted_beef.zip \
         flame_salmon_1_split.z01 flame_salmon_1_split.z02 \
         flame_salmon_1_split.z03 flame_salmon_1_split.zip \
         flame_steak.zip sear_steak.zip; do
  wget -q --show-progress "$base_url/$f" -P "$dest"
done

for scene in coffee_martini cook_spinach cut_roasted_beef flame_steak \
             sear_steak; do
  unzip -o "$dest/$scene.zip" -d "$dest"
done
# flame_salmon_1 ships as a split archive: join before extracting
zip -F "$dest/flame_salmon_1_split.zip" --out "$dest/flame_salmon_1.zip"
unzip -o "$dest/flame_salmon_1.zip" -d "$dest"

rm -f "$dest"/*.zip "$dest"/flame_salmon_1_split.z0*

for scene in coffee_martini cook_spinach cut_roasted_beef flame_salmon_1 \
             flame_steak sear_steak; do
  echo "extracting frames: $scene"
  python preprocess/preprocess_neu3d.py --datadir "$dest/$scene"
done
echo "Done."
