"""Inference-server entry point (framework extension; no reference
counterpart — the reference deploys by running its research test
scripts). Serve an AOT-exported bundle:

    python -m rdst_tpu.serving.export --config-file \
        config_files/rdst_e1_40k_oasis20_x4.ini --out bundles/rdst_e1 \
        --lr-hw 56 56
    python serve.py --bundle bundles/rdst_e1 --port 8000

or a live model straight from a training config:

    python serve.py --config-file config_files/rdst_e1_40k_oasis20_x4.ini

Request:  POST /v1/predict?scale=4  with .npy body (N,H,W,C) LR f32
Response: .npy body (N,H*s,W*s,C) HR f32
"""

from rdst_tpu.serving.server import main

if __name__ == "__main__":
    main()
