#!/bin/bash
# Backwards-compatibility check against the PUBLISHED ACE2-ERA5 model
# (reference: scripts/manual_backwards_compatibility/ace2-era5.sh).
# Downloads the published torch checkpoint + sample data from
# HuggingFace, converts the checkpoint to the native format with
# scripts/convert_torch_checkpoint.py, and runs a short inference
# through the real CLI. Requires network access; run manually.

set -e

REPO_ROOT="$(cd "$(dirname "$0")/../.." && pwd)"
WORKDIR="$(realpath -m "${1:-test_inference_ace2_era5}")"

mkdir -p "$WORKDIR"/initial_conditions "$WORKDIR"/forcing_data
cd "$WORKDIR"

fetch () {  # fetch <url> <dest>
    [ -f "$2" ] || wget "$1" -O "$2"
}
HF=https://huggingface.co/allenai/ACE2-ERA5/resolve/main
fetch "$HF/ace2_era5_ckpt.tar?download=true" ace2_era5_ckpt.tar
fetch "$HF/inference_config.yaml?download=true" inference_config.yaml
fetch "$HF/initial_conditions/ic_2020.nc?download=true" initial_conditions/ic_2020.nc
fetch "$HF/forcing_data/forcing_2020.nc?download=true" forcing_data/forcing_2020.nc

# torch checkpoint -> native msgpack checkpoint
python "$REPO_ROOT/scripts/convert_torch_checkpoint.py" \
    ace2_era5_ckpt.tar ace2_era5_ckpt.msgpack

# short run through the real inference entry (config overrides replace
# the reference's yq edits)
cd "$REPO_ROOT"
python -m ace_tpu.inference "$WORKDIR/inference_config.yaml" --override \
    experiment_dir="$WORKDIR/output" \
    n_forward_steps=50 \
    forward_steps_in_memory=5 \
    checkpoint_path="$WORKDIR/ace2_era5_ckpt.msgpack" \
    initial_condition.path="$WORKDIR/initial_conditions/ic_2020.nc" \
    forcing_loader.dataset.data_path="$WORKDIR/forcing_data/"

echo "backwards-compatibility inference finished; outputs in $WORKDIR/output"
