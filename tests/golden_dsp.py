"""Pure-numpy golden reference for the DSP tests.

Independent re-implementation of the standard librosa STFT/mel semantics
(center-padded reflect STFT, periodic hann, Slaney filterbank) used to
validate the fused JAX mel front-end. Written against the published formulas,
not against any particular library's source.
"""
import numpy as np


def hann_periodic(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def stft_mag(x: np.ndarray, n_fft: int, hop: int, win: int) -> np.ndarray:
    """Magnitude STFT, center=True reflect padding. Returns [n_bins, T]."""
    window = hann_periodic(win)
    if win < n_fft:
        pad = (n_fft - win) // 2
        window = np.pad(window, (pad, n_fft - win - pad))
    x = np.pad(x, (n_fft // 2, n_fft // 2), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    frames = np.stack([x[i * hop : i * hop + n_fft] for i in range(n_frames)])
    spec = np.fft.rfft(frames * window[None, :], axis=1)
    return np.abs(spec).T


def slaney_mel(sr: float, n_fft: int, n_mels: int, fmin: float, fmax: float):
    def to_mel(f):
        f = np.atleast_1d(np.asarray(f, dtype=np.float64))
        m = f / (200.0 / 3)
        log_region = f >= 1000.0
        m[log_region] = 15.0 + np.log(f[log_region] / 1000.0) / (np.log(6.4) / 27.0)
        return m

    def to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = m * (200.0 / 3)
        log_region = m >= 15.0
        f[log_region] = 1000.0 * np.exp((np.log(6.4) / 27.0) * (m[log_region] - 15.0))
        return f

    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sr / 2, n_bins)
    mel_f = to_hz(np.linspace(to_mel(fmin)[0], to_mel(fmax)[0], n_mels + 2))
    weights = np.zeros((n_mels, n_bins))
    for i in range(n_mels):
        lower = (fft_freqs - mel_f[i]) / (mel_f[i + 1] - mel_f[i])
        upper = (mel_f[i + 2] - fft_freqs) / (mel_f[i + 2] - mel_f[i + 1])
        weights[i] = np.maximum(0, np.minimum(lower, upper))
        weights[i] *= 2.0 / (mel_f[i + 2] - mel_f[i])
    return weights


def wav2lip_mel_golden(wav: np.ndarray) -> np.ndarray:
    """Golden wav2lip mel: preemph → |STFT| → mel → dB → symmetric norm."""
    k = 0.97
    y = np.concatenate([wav[:1], wav[1:] - k * wav[:-1]])
    mag = stft_mag(y, 800, 200, 800)
    melw = slaney_mel(16000, 800, 80, 55.0, 7600.0)
    mel = melw @ mag
    min_level = np.exp(-100 / 20 * np.log(10))
    db = 20 * np.log10(np.maximum(min_level, mel)) - 20.0
    return np.clip(8.0 * ((db + 100.0) / 100.0) - 4.0, -4.0, 4.0)


def whisper_mel_golden(wav: np.ndarray) -> np.ndarray:
    """Golden whisper log-mel: |STFT|² (last frame dropped) → mel → log10."""
    mag = stft_mag(wav, 400, 160, 400)
    power = (mag**2)[:, :-1]
    melw = slaney_mel(16000, 400, 80, 0.0, 8000.0)
    mel = melw @ power
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return (log_spec + 4.0) / 4.0
