#!/bin/bash
# Backwards-compatibility check against the PUBLISHED ACE-climSST model
# (reference: scripts/manual_backwards_compatibility/ace-climSST.sh).
# Same recipe as ace2-era5.sh with the climSST artifact set.

set -e

REPO_ROOT="$(cd "$(dirname "$0")/../.." && pwd)"
WORKDIR="$(realpath -m "${1:-test_inference_ace_climsst}")"

mkdir -p "$WORKDIR"/initial_conditions "$WORKDIR"/forcing_data
cd "$WORKDIR"

fetch () { [ -f "$2" ] || wget "$1" -O "$2"; }
HF=https://huggingface.co/allenai/ACE-climSST/resolve/main
fetch "$HF/ace_ckpt.tar?download=true" ace_ckpt.tar
fetch "$HF/inference_config.yaml?download=true" inference_config.yaml
fetch "$HF/initial_conditions/ic_0011-01-01.nc?download=true" initial_conditions/ic.nc
fetch "$HF/forcing_data/forcing_2021.nc?download=true" forcing_data/forcing.nc

python "$REPO_ROOT/scripts/convert_torch_checkpoint.py" \
    ace_ckpt.tar ace_ckpt.msgpack

cd "$REPO_ROOT"
python -m ace_tpu.inference "$WORKDIR/inference_config.yaml" --override \
    experiment_dir="$WORKDIR/output" \
    n_forward_steps=50 \
    forward_steps_in_memory=5 \
    checkpoint_path="$WORKDIR/ace_ckpt.msgpack" \
    initial_condition.path="$WORKDIR/initial_conditions/ic.nc" \
    forcing_loader.dataset.data_path="$WORKDIR/forcing_data/"

echo "backwards-compatibility inference finished; outputs in $WORKDIR/output"
