#!/bin/bash
# End-to-end walkthrough on CPU: synthesize data, train a tiny RDST,
# test it, AOT-export a serving bundle, serve it over HTTP, and
# super-resolve a whole NIfTI volume. ~2-4 min on a laptop CPU.
#
#   bash examples/quickstart.sh [workdir]
#
# On a TPU VM drop the "--gpu-id -1" / "--platform cpu" flags.
set -eu
cd "$(dirname "$0")/.."
WORK="${1:-$(mktemp -d /tmp/rdst_quickstart.XXXX)}"
echo "workdir: $WORK"

echo "== 1. synthetic OASIS example data (the real volumes are not shipped)"
python -m rdst_tpu.data.synthetic --root "$WORK/OASIS/example" --shape 40 48 40

echo "== 2. train the tiny config (4 quick epochs, CPU)"
python train.py --config-file config_files/rdst_tiny_oasis_x4.ini --gpu-id -1 \
    "data_folder='$WORK/OASIS/example'" "output_dir='$WORK/outputs'" \
    "patch_size=8" "margin_oasis=[2,2]" "epochs_in_total={'WarmUP': 4}" \
    "check_every=2" "quick_eva_num_samples=2" "multi_threads=1"

SNAP="$WORK/outputs/RDST_TINY_OASIS_SRx4_None/models/WarmUP_model_g.msgpack"

echo "== 3. test (same protocol as the reference's test.py)"
python test.py --config-file config_files/rdst_tiny_oasis_x4.ini --gpu-id -1 \
    "data_folder='$WORK/OASIS/example'" "output_dir='$WORK/outputs'" \
    "well_trained_single_scale_model_g='$SNAP'"

echo "== 4. AOT-export a self-contained serving bundle"
python -m rdst_tpu.serving.export --config-file config_files/rdst_tiny_oasis_x4.ini \
    --out "$WORK/bundle" --lr-hw 10 12 --platform cpu \
    "well_trained_single_scale_model_g='$SNAP'"

echo "== 5. serve it and round-trip a request"
python serve.py --bundle "$WORK/bundle" --port 18321 --platform cpu \
    > "$WORK/serve.log" 2>&1 &
SERVE_PID=$!
trap 'kill $SERVE_PID 2>/dev/null || true' EXIT
sleep 8
python - <<EOF
import numpy as np
from rdst_tpu.serving.client import SRClient
c = SRClient("http://127.0.0.1:18321")
assert c.health()["status"] == "ok"
y = c.predict(np.random.default_rng(0).random((2, 10, 12, 1)).astype(np.float32), 4.0)
print("served SR:", y.shape)
EOF
kill $SERVE_PID

echo "== 6. super-resolve a whole NIfTI volume through the bundle"
python - <<EOF
import numpy as np
from rdst_tpu.data import io
io.save("$WORK/vol.nii.gz", np.random.default_rng(1).random((10, 12, 4)).astype(np.float32))
EOF
python -m rdst_tpu.serving.volume --bundle "$WORK/bundle" \
    --in "$WORK/vol.nii.gz" --out "$WORK/vol_x4.nii.gz" --platform cpu

echo "== quickstart complete; artifacts in $WORK"
