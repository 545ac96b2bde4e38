"""Band drivers: the load_metadata -> batched infer -> mp4/csv/png contract."""
