"""Media transport: frame types, paced output tracks, WebRTC plumbing."""

from mere_fusion_tpu.transport.frames import AudioChunk, VideoImage  # noqa: F401
from mere_fusion_tpu.transport.tracks import (  # noqa: F401
    HumanPlayer,
    PlayerStreamTrack,
)
