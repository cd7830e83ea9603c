#!/usr/bin/env bash
# The evaluation configurations from BASELINE.md / the upstream README
# (README.md:76-310 command surface translated 1:1). Requires the pretrained
# checkpoints in models/ (see models/README.md); add --allow_random_init=true
# to smoke-test any pipeline without them.
set -euo pipefail

STEPS=${STEPS:-30}
IMAGES=${IMAGES:-10}          # paper protocol: 3000
DATA=${DATA:-data/imagenet/}
COMMON="--num_steps=${STEPS} --total_images=${IMAGES} --dataset_path=${DATA} \
        --noise_sigma=0.1 --batch_size=${BATCH:-1}"

# (2) ImageNet-256 random inpainting with DPS
python generate_conditional.py --outdir=out/dps_inpainting $COMMON \
    --conditioning_mechanism=dps --operator_name=inpainting \
    --inpainting_type=random --inpainting_prob_lower=0.6 --inpainting_prob_upper=0.8 \
    --cond_scaling=0.4

# (3a) gaussian blur with PiGDM
python generate_conditional.py --outdir=out/pigdm_blur $COMMON \
    --conditioning_mechanism=pigdm --operator_name=gaussian_blur \
    --pigdm_posthoc_scaling=true

# (3b) 4x super-resolution with DDNM+ (steps are doubled internally for heun parity)
python generate_conditional.py --outdir=out/ddnm_sr $COMMON \
    --conditioning_mechanism=ddnm --operator_name=super_resolution --scale_factor=4

# (4) Free Hunch full pipeline (DCT prior + time/space updates + tailored CG)
#     on motion blur — the paper's headline configuration
python generate_conditional.py --outdir=out/freehunch_motion $COMMON \
    --conditioning_mechanism=online_covariance --operator_name=motion_blur \
    --image_base_covariance=dct_diagonal --solver_type=customcuda \
    --space_step_update_threshold=10.0 --space_step_update_lower_threshold=1.0

# (5) multi-operator sweep: dense (identity) vs memory-efficient (DCT) covariance
for op in gaussian_blur super_resolution inpainting; do
  for ibc in identity dct_diagonal; do
    python generate_conditional.py --outdir=out/sweep_${op}_${ibc} $COMMON \
        --conditioning_mechanism=online_covariance --operator_name=${op} \
        --image_base_covariance=${ibc}
  done
done

# comparison grid across methods
python create_image_visualisation.py \
    --runs out/dps_inpainting out/pigdm_blur out/freehunch_motion \
    --num_images 6 --out out/comparison.png
