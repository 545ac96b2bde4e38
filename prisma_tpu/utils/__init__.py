"""Small host-side helpers: metadata manifest, paths, timing."""
