"""Device compute primitives: DSP front-ends, ring buffers, field encoders,
ray marching. Pure jnp where XLA already fuses well; Pallas where it does not.
"""

from mere_fusion_tpu.ops.mel import (  # noqa: F401
    MelConfig,
    WAV2LIP_MEL,
    WHISPER_MEL,
    WHISPER_MEL_128,
    whisper_mel_config,
    mel_filterbank,
    melspectrogram,
)
from mere_fusion_tpu.ops.ringbuffer import (  # noqa: F401
    RingBuffer,
    ring_new,
    ring_push,
    ring_window,
    ring_last,
)
