#!/bin/sh
# Debug chain (reference run-all-tools.sh): threshold -> optimise ->
# compress -> merge round trip on one image. Not a production tool.
set -e
IMG=$1
PREFIX=${2:-/tmp/mrctools}
HERE=$(dirname "$0")
python3 "$HERE/threshold-image" "$IMG" "$PREFIX"_mask.png --denoise fast
python3 "$HERE/partial-blur" "$IMG" "$PREFIX"_mask.png "$PREFIX"_fg.png --mode optimise -n 3
python3 "$HERE/compress" "$IMG" "$PREFIX"_mask.png "$PREFIX"
python3 "$HERE/merge" "$PREFIX"_mask.png "$PREFIX"_fg.jp2 "$PREFIX"_bg.jp2 "$PREFIX"_merged.png
echo "round trip artifacts at $PREFIX*"
