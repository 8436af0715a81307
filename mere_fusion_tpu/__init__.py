"""mere-fusion-tpu: a TPU-native real-time digital-human framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
CUDA/torch implementation (Caxson/mere-fusion): streaming ASR, three
audio-to-face avatar generators (Wav2Lip / MuseTalk / ER-NeRF), TTS adapters,
LLM orchestration, and a WebRTC session server.

Layout:
    ops/        device compute primitives (mel front-end, ring buffers,
                encoders, raymarching) — jnp + Pallas
    models/     flax model definitions (Wav2Lip, Whisper, MuseTalk, ER-NeRF)
    engines/    real-time avatar engines (the L3 "*Real" layer)
    asr/        streaming ASR host logic + TPU backends
    tts/        TTS adapters
    llm/        LLM adapters
    server/     session + HTTP API layer
    transport/  WebRTC/RTP media plumbing
    parallel/   mesh/sharding utilities (pjit/shard_map scale-out)
    runtime/    async device executor, metrics, profiling
    utils/      checkpoint conversion and IO
"""

__version__ = "0.1.0"
