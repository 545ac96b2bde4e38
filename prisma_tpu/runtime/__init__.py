"""Runtime: typed config, device mesh helpers, the frame-stream engine."""
