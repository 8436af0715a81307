"""Training harnesses (Wav2Lip generator/syncnet, ER-NeRF trainer)."""
