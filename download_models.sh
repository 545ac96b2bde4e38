#!/usr/bin/env bash
# Fetch the pretrained checkpoints prisma-tpu converts at load time
# (equivalent of the reference download_models.sh, plus the bands it lacked).
# Run on a machine with network access; place results in models/.
set -euo pipefail
mkdir -p models
cd models

# RAFT (sintel)
wget -nc https://dl.dropboxusercontent.com/s/4j4z58wuv8o0mfz/models.zip -O raft_models.zip \
  && unzip -jo raft_models.zip models/raft-sintel.pth && rm -f raft_models.zip

# GMFlow (sintel)
wget -nc https://huggingface.co/haofeixu/gmflow/resolve/main/gmflow_sintel-0c07dcb3.pth

# SOLOv2 R101
wget -nc https://download.openmmlab.com/mmdetection/v2.0/solov2/solov2_r101_fpn_3x_coco/solov2_r101_fpn_3x_coco_20220511_095119-c559a076.pth

# Depth-Anything (relative vits/vitb/vitl + metric indoor/outdoor)
for enc in vits vitb vitl; do
  wget -nc "https://huggingface.co/LiheYoung/depth_anything_${enc}14/resolve/main/pytorch_model.bin" \
    -O "depth_anything_${enc}14.pt"
done
wget -nc https://huggingface.co/spaces/LiheYoung/Depth-Anything/resolve/main/checkpoints_metric_depth/depth_anything_metric_depth_indoor.pt
wget -nc https://huggingface.co/spaces/LiheYoung/Depth-Anything/resolve/main/checkpoints_metric_depth/depth_anything_metric_depth_outdoor.pt

# MiDaS DPT_Large
wget -nc https://github.com/isl-org/MiDaS/releases/download/v3/dpt_large_384.pt

# ZoeDepth ZoeD_N
wget -nc https://github.com/isl-org/ZoeDepth/releases/download/v1.0/ZoeD_M12_N.pt

# PatchFusion u4k
wget -nc https://huggingface.co/zhyever/PatchFusion/resolve/main/patchfusion_u4k.pt

# Marigold (diffusers snapshot: unet/vae/text_encoder)
mkdir -p marigold
for comp in unet vae text_encoder; do
  mkdir -p "marigold/${comp}"
  wget -nc "https://huggingface.co/Bingxin/Marigold/resolve/main/${comp}/diffusion_pytorch_model.bin" \
    -O "marigold/${comp}/diffusion_pytorch_model.bin" || \
  wget -nc "https://huggingface.co/Bingxin/Marigold/resolve/main/${comp}/pytorch_model.bin" \
    -O "marigold/${comp}/pytorch_model.bin"
done

echo "done; optionally pre-convert with: python -m prisma_tpu.weights.convert_all"
