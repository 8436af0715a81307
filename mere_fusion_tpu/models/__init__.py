"""Flax model definitions (Wav2Lip, Whisper, MuseTalk, ER-NeRF, S3FD)."""
