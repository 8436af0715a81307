"""Cross-attention DTW word alignment."""
import numpy as np
import jax
import jax.numpy as jnp

from mere_fusion_tpu.asr.align import (
    dtw_path,
    median_filter,
    token_times,
    words_with_times,
)


def test_dtw_follows_a_clean_diagonal():
    n, t = 6, 18
    cost = np.ones((n, t))
    for i in range(n):
        cost[i, 3 * i : 3 * i + 3] = 0.0   # optimal band
    ti, tj = dtw_path(cost)
    assert ti[0] == 0 and tj[0] == 0
    assert ti[-1] == n - 1 and tj[-1] == t - 1
    assert (np.diff(ti) >= 0).all() and (np.diff(tj) >= 0).all()
    # the path's first time index per token tracks the band
    firsts = [tj[ti == i].min() for i in range(n)]
    assert all(abs(f - 3 * i) <= 1 for i, f in enumerate(firsts))


def test_median_filter_edges():
    x = np.asarray([[1.0, 9.0, 1.0, 1.0, 1.0]])
    out = median_filter(x, 3)
    assert out.shape == x.shape
    assert out[0, 1] == 1.0   # spike removed


def test_token_times_from_synthetic_attention():
    """Attention sharply peaked at frame 4*i for token i → starts ≈ 0.08*i."""
    nl, h, n_prompt, n_text, t = 4, 2, 3, 5, 40
    L = n_prompt + n_text
    attn = np.full((nl, 1, h, L, t), 1e-3, np.float32)
    for i in range(n_text):
        attn[:, :, :, n_prompt + i, 4 * i] = 1.0
    starts = token_times(attn, n_prompt, t, filter_width=1)
    assert starts.shape == (n_text,)
    np.testing.assert_allclose(starts, 0.08 * np.arange(n_text), atol=0.021)


class _Tok:
    def decode(self, toks):
        return {1: " hello", 2: " wor", 3: "ld", 4: " x"}[toks[0]]


def test_words_with_times_merges_subword_tokens():
    starts = np.asarray([0.1, 0.5, 0.6, 0.9], np.float32)
    words = words_with_times([1, 2, 3, 4], starts, _Tok(), seg_end=1.2)
    assert [w[2] for w in words] == ["hello", "world", "x"]
    np.testing.assert_allclose(words[0][:2], (0.1, 0.5), atol=1e-6)
    np.testing.assert_allclose(words[1][:2], (0.5, 0.9), atol=1e-6)
    np.testing.assert_allclose(words[2][:2], (0.9, 1.2), atol=1e-6)
    # monotone, non-crossing
    flat = [b for w in words for b in w[:2]]
    assert flat == sorted(flat)


def test_backend_emits_dtw_word_times():
    """End-to-end through JaxWhisperBackend with a random tiny model and a
    stub tokenizer: words carry monotone in-range times."""
    from mere_fusion_tpu.asr.backends import JaxWhisperBackend
    from mere_fusion_tpu.models.whisper import WhisperDims

    small = WhisperDims(
        n_mels=80, n_audio_ctx=48, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_vocab=100, n_text_ctx=160, n_text_state=64,
        n_text_head=2, n_text_layer=2,
    )

    class Tok:
        def decode(self, toks):
            return f" t{toks[0]}"

        def encode(self, s):
            return [hash(s) % 100]

    b = JaxWhisperBackend(dims=small, tokenizer=Tok(), word_timestamps=True)
    audio = np.sin(np.linspace(0, 200, 8000)).astype(np.float32) * 0.3
    res = b.transcribe(audio)
    words = b.ts_words(res)
    if words:  # random model may emit EOT immediately
        ts = [w.beg for w in words] + [words[-1].end]
        assert ts == sorted(ts)
        assert 0 <= ts[0] and ts[-1] <= res["duration"] + 1e-6
