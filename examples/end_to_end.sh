#!/bin/bash
# Full workflow demo: data -> train -> deploy (precropped + wholeview)
# -> evaluate -> compare. Runs on whatever device jax sees (TPU, or
# UBTPU_PLATFORM=cpu). ~5 min on one TPU chip.
set -euo pipefail
WORK=${1:-/tmp/ubtpu_demo}
mkdir -p "$WORK"

echo "== 1. synthetic data =="
python - "$WORK" <<'PY'
import sys
from ubresnet_tpu.data import make_synthetic_file
w = sys.argv[1]
make_synthetic_file(f"{w}/train.uevt", n_events=64, hw=(256, 256), seed=1)
make_synthetic_file(f"{w}/valid.uevt", n_events=16, hw=(256, 256), seed=2)
make_synthetic_file(f"{w}/test.uevt", n_events=8, hw=(512, 512), seed=3)
make_synthetic_file(f"{w}/whole.uevt", n_events=1, wholeview=True, seed=4)
print("data written to", w)
PY

echo "== 2. train =="
cat > "$WORK/cfg.json" <<JSON
{
  "model": {"inplanes": 16, "input_channels": 1},
  "optim": {"name": "adam", "lr": 1e-3, "weight_decay": 1e-4},
  "train_data": {"files": ["$WORK/train.uevt"], "batch_size": 8,
                 "mirror": true, "sparse_bucket": 4096},
  "valid_data": {"files": ["$WORK/valid.uevt"], "batch_size": 4},
  "num_iters": 200, "valid_every": 50, "valid_batches": 2,
  "checkpoint_every": 100, "print_every": 50,
  "checkpoint_dir": "$WORK/ckpt", "log_dir": "$WORK/logs"
}
JSON
python -m ubresnet_tpu.cli.train -c "$WORK/cfg.json"

echo "== 3. precropped deploy (512x512 crops, orbax checkpoint) =="
python -m ubresnet_tpu.cli.infer_precropped \
  -i "$WORK/test.uevt" -o "$WORK/test_scores.uevt" \
  -c "$WORK/ckpt" --config "$WORK/cfg.json" --best -p 2 -b 4

echo "== 4. wholeview deploy (1008x3456 plane) =="
python -m ubresnet_tpu.cli.infer_wholeview \
  -i "$WORK/whole.uevt" -o "$WORK/whole_scores.uevt" \
  -c "$WORK/ckpt" --config "$WORK/cfg.json" --best

echo "== 5. evaluate vs truth =="
python -m ubresnet_tpu.cli.evaluate "$WORK/test_scores.uevt" "$WORK/test.uevt" \
  --score-producer uburn_plane2
python -m ubresnet_tpu.cli.evaluate "$WORK/whole_scores.uevt" "$WORK/whole.uevt" \
  --score-producer ubsnet_plane2

echo "== 6. visual diffs =="
python -m ubresnet_tpu.cli.compare "$WORK/whole_scores.uevt" "$WORK/whole_scores.uevt" \
  --producer-a ubsnet_plane2 --producer-b ubsnet_plane2 \
  --adc-file "$WORK/whole.uevt" --dump-dir "$WORK/pngs"
echo "demo complete: artifacts in $WORK"
