"""MuseTalk model family: AutoencoderKL (sd-vae-ft-mse), the audio-
conditioned UNet, and the 384-d positional encoding on whisper features."""

from mere_fusion_tpu.models.musetalk.vae import AutoencoderKL, VAEConfig  # noqa: F401
from mere_fusion_tpu.models.musetalk.unet import (  # noqa: F401
    UNet2DCondition,
    UNetConfig,
    MUSETALK_UNET,
    positional_encoding,
)
