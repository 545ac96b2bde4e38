"""Command-line entry points (process / view / concat), flag-compatible with
the reference CLIs but running bands in-process on the device mesh."""
