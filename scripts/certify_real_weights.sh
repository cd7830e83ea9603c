#!/usr/bin/env bash
# "Weights arrived" one-command certification (VERDICT r3 item 6).
#
# This environment has zero egress, so every real-weight artifact (UNet
# checkpoints, LPIPS VGG, FID Inception, SD-VAE) is absent and the
# corresponding tests/metrics run gated or flagged as proxies. The moment the
# files exist, this script converts them, re-runs every gated certification,
# and reports which proxies became real — one command, no code changes.
#
# Expected inputs (any subset; missing ones are reported and skipped):
#   models/256x256_diffusion_uncond.pt   ImageNet-256 ADM UNet
#                                        (reference README.md:44-49)
#   models/ffhq_10m.pt                   FFHQ-256 checkpoint
#   weights/vgg16.pth                    torchvision VGG16 features state_dict
#   weights/lpips_vgg.pth                lpips lin heads (lpips/weights/v0.1/vgg.pth)
#   weights/pt_inception-2015-12-05-6726825d.pth   pytorch-fid Inception
#   weights/sd_vae.bin                   SD-VAE diffusion_pytorch_model.bin
#
# Env: CERT_STEPS (default 3) — Heun steps for the real-weight free-running
# A/B smoke (the torch reference side runs on CPU here; 3 steps = 5 guidance
# calls ~ 10-15 min. On a CUDA box export CERT_STEPS=30 for the full run).
set -u
cd "$(dirname "$0")/.."
STEPS="${CERT_STEPS:-3}"
PASS=()
SKIP=()
FAIL=()

note() { echo "[certify] $*" >&2; }
record() { # record <status-array-name> <label>
  case "$1" in
    pass) PASS+=("$2");;
    skip) SKIP+=("$2");;
    fail) FAIL+=("$2");;
  esac
}

# ---------------------------------------------------------------- UNet ckpts
if [ -f models/256x256_diffusion_uncond.pt ]; then
  note "ImageNet-256 checkpoint present: flagship conversion A/B (file-presence-driven gate)"
  if python -m pytest tests/test_flagship_conversion.py -x -q; then
    record pass "flagship conversion A/B (552M + FFHQ layouts)"
  else
    record fail "flagship conversion A/B"
  fi
  note "real-weight free-running 256px A/B vs the torch reference (${STEPS} steps)"
  if python scripts/ab_reference_pipeline.py --mode free \
      --checkpoint models/256x256_diffusion_uncond.pt \
      --setup models/256x256_diffusion_uncond_setup.txt \
      --steps "$STEPS" --operator gaussian_blur \
      --out docs/ab_reference_256_realweights_free.json; then
    record pass "real-weight 256px free-running A/B -> docs/ab_reference_256_realweights_free.json"
  else
    record fail "real-weight 256px free-running A/B"
  fi
else
  record skip "UNet checkpoint certification (models/256x256_diffusion_uncond.pt absent)"
fi

# ---------------------------------------------------------------- LPIPS
if [ -f weights/vgg16.pth ] && [ -f weights/lpips_vgg.pth ]; then
  note "LPIPS sources present: converting"
  mkdir -p weights/converted
  if python scripts/convert_lpips_weights.py --vgg weights/vgg16.pth \
      --lins weights/lpips_vgg.pth --out weights/converted/lpips_vgg.npz; then
    export LPIPS_WEIGHTS="$PWD/weights/converted/lpips_vgg.npz"
    if python -m pytest tests/test_lpips.py -x -q \
        && python - <<'EOF'
from free_hunch_tpu.metrics import quality
fn = quality.lpips_fn("vgg")
assert fn.is_proxy is False, "LPIPS still a proxy after conversion"
print("LPIPS real-weight path active")
EOF
    then
      record pass "real LPIPS (export LPIPS_WEIGHTS=$LPIPS_WEIGHTS)"
    else
      record fail "real LPIPS validation"
    fi
  else
    record fail "LPIPS conversion"
  fi
else
  record skip "LPIPS (weights/vgg16.pth + weights/lpips_vgg.pth absent)"
fi

# ---------------------------------------------------------------- FID
if [ -f weights/pt_inception-2015-12-05-6726825d.pth ]; then
  note "FID Inception source present: converting"
  mkdir -p weights/converted
  if python - <<'EOF'
import numpy as np, torch
from free_hunch_tpu.metrics import fid
sd = torch.load("weights/pt_inception-2015-12-05-6726825d.pth",
                map_location="cpu", weights_only=True)
sd = {k: v.numpy() for k, v in sd.items()}
np.savez_compressed("weights/converted/fid_inception.npz",
                    **fid.convert_torch_weights(sd))
print("wrote weights/converted/fid_inception.npz")
EOF
  then
    export FID_WEIGHTS="$PWD/weights/converted/fid_inception.npz"
    if python - <<'EOF'
import os
from free_hunch_tpu.metrics import fid
extract, is_proxy = fid.make_extractor()
assert not is_proxy, "FID still a proxy after conversion"
print("FID real-weight path active")
EOF
    then
      record pass "real FID (export FID_WEIGHTS=$FID_WEIGHTS)"
    else
      record fail "real FID validation"
    fi
  else
    record fail "FID conversion"
  fi
else
  record skip "FID (weights/pt_inception-2015-12-05-6726825d.pth absent)"
fi

# ---------------------------------------------------------------- SD-VAE
if [ -f weights/sd_vae.bin ]; then
  note "SD-VAE source present: converting"
  mkdir -p weights/converted
  if python scripts/convert_vae_weights.py --ckpt weights/sd_vae.bin \
      --out weights/converted/sd_vae.npz; then
    export VAE_WEIGHTS="$PWD/weights/converted/sd_vae.npz"
    if python -m pytest tests/test_vae.py -x -q; then
      record pass "real SD-VAE (export VAE_WEIGHTS=$VAE_WEIGHTS)"
    else
      record fail "real SD-VAE validation"
    fi
  else
    record fail "SD-VAE conversion"
  fi
else
  record skip "SD-VAE (weights/sd_vae.bin absent)"
fi

# ---------------------------------------------------------------- summary
echo
echo "==== certification summary ===="
for p in "${PASS[@]:-}"; do [ -n "$p" ] && echo "  PASS  $p"; done
for s in "${SKIP[@]:-}"; do [ -n "$s" ] && echo "  SKIP  $s"; done
for f in "${FAIL[@]:-}"; do [ -n "$f" ] && echo "  FAIL  $f"; done
echo
echo "Persist the exported *_WEIGHTS env vars (e.g. in your shell profile)"
echo "to keep the real-weight paths active for eval runs."
[ "${#FAIL[@]}" -eq 0 ]
