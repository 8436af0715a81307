"""Dataset providers (ER-NeRF transforms.json format)."""
