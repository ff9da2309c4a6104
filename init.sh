#!/usr/bin/env bash
# Bootstrap — the reference's init.sh equivalent (SURVEY.md §3.5):
# create the expected data/model/output layout and build native components.
set -e
cd "$(dirname "$0")"

mkdir -p data model/pretrained_model output
# expected symlinks (populate manually or symlink your datasets):
#   data/coco       -> COCO with annotations/{instances,panoptic}_*.json
#   data/cityscapes -> Cityscapes with leftImg8bit/ + gtFine/

# native components (optional fast paths; numpy fallbacks exist)
make -C native

echo "init done. Place datasets under data/ and converted weights under"
echo "model/pretrained_model/ (see upsnet_tpu/convert/torch_converter.py)."
