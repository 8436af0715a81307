"""Mel-spectrogram front-end as one fused XLA computation.

Numerically matches the reference's two librosa/torch DSP stacks
(reference: wav2lip/audio.py:45-121 for the Wav2Lip mel;
musetalk/whisper/whisper/audio.py:92-124 for the Whisper log-mel) but is
designed TPU-first: framing is a static gather, the windowed real DFT is two
matmuls against precomputed cos/sin matrices (MXU work, not an FFT butterfly),
and the mel projection is a third matmul. XLA fuses the elementwise
pre-emphasis / log / normalize stages into these.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class MelConfig:
    sample_rate: int = 16_000
    n_fft: int = 800
    hop: int = 200
    win: int = 800
    n_mels: int = 80
    fmin: float = 55.0
    fmax: float = 7600.0
    power: float = 1.0            # 1 = magnitude (wav2lip), 2 = power (whisper)
    preemph: float | None = 0.97  # None disables
    drop_last_frame: bool = False # whisper drops the final STFT column
    log_style: str = "db_norm"    # "db_norm" (wav2lip) | "log10" (whisper)
    min_level_db: float = -100.0
    ref_level_db: float = 20.0
    max_abs_value: float = 4.0


WAV2LIP_MEL = MelConfig()

WHISPER_MEL = MelConfig(
    n_fft=400,
    hop=160,
    win=400,
    fmin=0.0,
    fmax=8000.0,
    power=2.0,
    preemph=None,
    drop_last_frame=True,
    log_style="log10",
)

# large-v3 front-end: identical pipeline, 128 mel bins (OpenAI whisper
# generates its mel_128 asset with the same librosa slaney filterbank this
# module reimplements, just n_mels=128; reference vendored copy supports 80
# only — musetalk/whisper/whisper/audio.py:87)
WHISPER_MEL_128 = MelConfig(
    n_fft=400,
    hop=160,
    win=400,
    n_mels=128,
    fmin=0.0,
    fmax=8000.0,
    power=2.0,
    preemph=None,
    drop_last_frame=True,
    log_style="log10",
)


def whisper_mel_config(n_mels: int) -> MelConfig:
    """Whisper log-mel config for a checkpoint's dims.n_mels (80 for
    tiny…large-v2, 128 for large-v3)."""
    if n_mels == 80:
        return WHISPER_MEL
    if n_mels == 128:
        return WHISPER_MEL_128
    import dataclasses

    return dataclasses.replace(WHISPER_MEL, n_mels=n_mels)


def _hz_to_mel(freq: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa default, htk=False)."""
    freq = np.asarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freq >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = mels * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=8)
def mel_filterbank(cfg: MelConfig) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape [n_mels, n_bins]."""
    n_bins = cfg.n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, cfg.sample_rate / 2, n_bins)
    mel_pts = np.linspace(_hz_to_mel(cfg.fmin), _hz_to_mel(cfg.fmax), cfg.n_mels + 2)
    mel_f = _mel_to_hz(mel_pts)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney area normalization
    enorm = 2.0 / (mel_f[2 : cfg.n_mels + 2] - mel_f[: cfg.n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dft_window_matrices(cfg: MelConfig) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT matrices [n_fft, n_bins] for cos and -sin parts.

    The hann window (periodic, as used by both librosa and torch.stft) is
    folded into the matrices so framing → DFT is a single matmul pair.
    """
    n = cfg.n_fft
    n_bins = n // 2 + 1
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(cfg.win) / cfg.win)
    if cfg.win < n:  # center-pad window to n_fft (librosa semantics)
        pad = (n - cfg.win) // 2
        window = np.pad(window, (pad, n - cfg.win - pad))
    t = np.arange(n)[:, None] * np.arange(n_bins)[None, :]
    angle = 2.0 * np.pi * t / n
    cos_m = (np.cos(angle) * window[:, None]).astype(np.float32)
    sin_m = (-np.sin(angle) * window[:, None]).astype(np.float32)
    return cos_m, sin_m


def _preemphasis(x: jnp.ndarray, k: float) -> jnp.ndarray:
    """y[n] = x[n] - k * x[n-1], y[0] = x[0] (matches scipy lfilter([1,-k],[1]))."""
    return jnp.concatenate([x[:1], x[1:] - k * x[:-1]])


def num_mel_frames(n_samples: int, cfg: MelConfig) -> int:
    """Frames produced for an input of n_samples (center-padded STFT)."""
    frames = 1 + n_samples // cfg.hop
    return frames - 1 if cfg.drop_last_frame else frames


@functools.partial(jax.jit, static_argnums=1)
def melspectrogram(wav: jnp.ndarray, cfg: MelConfig = WAV2LIP_MEL) -> jnp.ndarray:
    """Compute a mel spectrogram of shape [n_mels, n_frames].

    wav: 1-D float32 PCM at cfg.sample_rate in [-1, 1].
    """
    x = wav.astype(jnp.float32)
    if cfg.preemph is not None:
        x = _preemphasis(x, cfg.preemph)

    pad = cfg.n_fft // 2
    x = jnp.pad(x, (pad, pad), mode="reflect")

    n_frames = 1 + (x.shape[0] - cfg.n_fft) // cfg.hop
    idx = np.arange(n_frames)[:, None] * cfg.hop + np.arange(cfg.n_fft)[None, :]
    frames = x[idx]  # [T, n_fft] static gather

    # DSP fidelity needs true fp32 matmuls; TPU would otherwise use bf16 MXU
    # passes and dB-domain parity with the reference would drift ~0.2 dB.
    hi = jax.lax.Precision.HIGHEST
    cos_m, sin_m = _dft_window_matrices(cfg)
    re = jnp.dot(frames, jnp.asarray(cos_m), precision=hi)
    im = jnp.dot(frames, jnp.asarray(sin_m), precision=hi)
    power = re * re + im * im  # [T, n_bins]
    if cfg.drop_last_frame:
        power = power[:-1]
    if cfg.power == 1.0:
        spec = jnp.sqrt(jnp.maximum(power, 0.0))
    else:
        spec = power

    mel = jnp.dot(spec, jnp.asarray(mel_filterbank(cfg)).T, precision=hi)  # [T, n_mels]
    mel = mel.T  # [n_mels, T] — reference orientation

    if cfg.log_style == "db_norm":
        # amp_to_db − ref, then symmetric clip-normalize into [−max_abs, max_abs]
        min_level = jnp.exp(cfg.min_level_db / 20.0 * jnp.log(10.0))
        db = 20.0 * jnp.log10(jnp.maximum(min_level, mel)) - cfg.ref_level_db
        v = cfg.max_abs_value
        return jnp.clip(
            2.0 * v * ((db - cfg.min_level_db) / (-cfg.min_level_db)) - v, -v, v
        )
    elif cfg.log_style == "log10":
        log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - 8.0)
        return (log_spec + 4.0) / 4.0
    else:
        raise ValueError(f"unknown log_style {cfg.log_style!r}")
