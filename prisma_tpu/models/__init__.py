"""Model families: ViT/DPT depth, RAFT/GMFlow optical flow, SOLOv2 masks, etc."""
