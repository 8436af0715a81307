import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mere_fusion_tpu.models.whisper import (
    EOT,
    TINY,
    Whisper,
    WhisperDims,
    make_greedy_decoder,
    sot_sequence,
)
from mere_fusion_tpu.utils.torch_convert import convert_whisper

REFERENCE = "/root/reference"
SMALL = WhisperDims(
    n_mels=80, n_audio_ctx=48, n_audio_state=64, n_audio_head=2, n_audio_layer=2,
    n_vocab=100, n_text_ctx=24, n_text_state=64, n_text_head=2, n_text_layer=2,
)


def test_encoder_shapes_and_embeddings():
    model = Whisper(SMALL)
    mel = jnp.zeros((2, 80, 96))
    variables = model.init(jax.random.key(0), mel, jnp.zeros((2, 4), jnp.int32))
    out, emb = model.apply(variables, mel, True, method=Whisper.encode)
    assert out.shape == (2, 48, 64)
    assert emb.shape == (2, 3, 48, 64)  # pre-block + 2 layers


def test_greedy_decode_terminates():
    model = Whisper(SMALL)
    mel = jnp.zeros((1, 80, 96))
    variables = model.init(jax.random.key(0), mel, jnp.zeros((1, 4), jnp.int32))
    xa = model.apply(variables, mel, method=Whisper.encode)
    decode = make_greedy_decoder(model, variables, max_new_tokens=8)
    prompt = jnp.asarray([[1, 2]], jnp.int32)
    tokens = decode(xa, prompt, 2)
    assert tokens.shape == (1, 10)


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_parity_vs_reference_torch():
    torch = pytest.importorskip("torch")
    sys.modules.setdefault("ffmpeg", types.ModuleType("ffmpeg"))
    sys.path.insert(0, os.path.join(REFERENCE, "musetalk", "whisper"))
    try:
        from whisper.model import ModelDimensions, Whisper as TorchWhisper
    finally:
        sys.path.pop(0)

    tdims = ModelDimensions(
        n_mels=80, n_audio_ctx=48, n_audio_state=64, n_audio_head=2, n_audio_layer=2,
        n_vocab=100, n_text_ctx=24, n_text_state=64, n_text_head=2, n_text_layer=2,
    )
    tmodel = TorchWhisper(tdims).eval()
    with torch.no_grad():
        # the reference leaves decoder.positional_embedding as torch.empty
        # (uninitialized memory) — give it defined values for the comparison
        tmodel.decoder.positional_embedding.normal_(0, 0.02)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 80, 96)).astype(np.float32)
    tokens = rng.integers(0, 100, (2, 8)).astype(np.int64)

    with torch.no_grad():
        t_xa, t_emb = tmodel.encoder(torch.from_numpy(mel), include_embeddings=True)
        t_logits = tmodel.decoder(torch.from_numpy(tokens), t_xa)

    variables = convert_whisper(tmodel.state_dict(), SMALL)
    model = Whisper(SMALL)
    xa, emb = model.apply(variables, jnp.asarray(mel), True, method=Whisper.encode)
    logits = model.apply(
        variables, jnp.asarray(tokens.astype(np.int32)), xa, method=Whisper.logits
    )

    np.testing.assert_allclose(np.asarray(xa), t_xa.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(emb), t_emb, atol=2e-5)
    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(), atol=5e-4)


def test_sot_sequence():
    assert sot_sequence(0) == [50258, 50259, 50359, 50363]


def test_cached_decode_matches_full_rescoring():
    from mere_fusion_tpu.models.whisper import make_cached_greedy_decoder

    model = Whisper(SMALL)
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal((2, 80, 96)).astype(np.float32))
    variables = model.init(jax.random.key(1), mel, jnp.zeros((2, 4), jnp.int32))
    xa = model.apply(variables, mel, method=Whisper.encode)
    prompt = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)

    full = make_greedy_decoder(model, variables, max_new_tokens=10)
    cached = make_cached_greedy_decoder(model, variables, max_new_tokens=10)
    t_full = np.asarray(full(xa, prompt, 3))
    t_cached = np.asarray(cached(xa, prompt, 3))
    np.testing.assert_array_equal(t_cached, t_full)


def test_beam_search_decoder():
    """Beam search returns a well-formed hypothesis whose total generated
    logprob is >= the greedy path's (beam explores a superset), and respects
    the prompt prefix."""
    from mere_fusion_tpu.models.whisper import (
        make_cached_beam_decoder,
        make_cached_greedy_decoder,
    )

    model = Whisper(SMALL)
    rng = np.random.default_rng(7)
    mel = jnp.asarray(rng.standard_normal((1, 80, 96)).astype(np.float32))
    variables = model.init(jax.random.key(2), mel, jnp.zeros((1, 4), jnp.int32))
    xa = model.apply(variables, mel, method=Whisper.encode)
    prompt = jnp.asarray([[1, 2, 3]], jnp.int32)

    greedy = make_cached_greedy_decoder(model, variables, max_new_tokens=8)
    beam = make_cached_beam_decoder(model, variables, beam_size=3,
                                    max_new_tokens=8)
    t_g = np.asarray(greedy(xa, prompt, 3))[0]
    t_b = np.asarray(beam(xa, prompt, 3))[0]
    assert t_b.shape == t_g.shape
    np.testing.assert_array_equal(t_b[:3], [1, 2, 3])  # prompt preserved

    def seq_logprob(tokens):
        logits = model.apply(
            variables, jnp.asarray(tokens[None]), xa, method=Whisper.logits
        )
        lp = jax.nn.log_softmax(logits, axis=-1)[0]
        total = 0.0
        for i in range(3, len(tokens)):
            tok = int(tokens[i])
            total += float(lp[i - 1, tok])
            if tok == EOT:
                break
        return total

    assert seq_logprob(t_b) >= seq_logprob(t_g) - 1e-4


def _torch_whisper(tdims_kw):
    """Build the reference vendored torch Whisper at the given dims."""
    torch = pytest.importorskip("torch")
    sys.modules.setdefault("ffmpeg", types.ModuleType("ffmpeg"))
    sys.path.insert(0, os.path.join(REFERENCE, "musetalk", "whisper"))
    try:
        from whisper.model import ModelDimensions, Whisper as TorchWhisper
    finally:
        sys.path.pop(0)
    tmodel = TorchWhisper(ModelDimensions(**tdims_kw)).eval()
    with torch.no_grad():
        # reference leaves decoder.positional_embedding uninitialized
        tmodel.decoder.positional_embedding.normal_(0, 0.02)
    return torch, tmodel


# reduced-context versions of the published base/small/large-v3 shapes: real
# widths, head counts, and mel-bin counts (whisper_online.py:613 defaults to
# large-v2; large-v3 is the 128-mel front-end), context/vocab shrunk so the
# random-weight torch twin runs in test time.
SIZE_CASES = {
    "base": dict(n_mels=80, n_audio_state=512, n_audio_head=8,
                 n_audio_layer=2, n_text_state=512, n_text_head=8,
                 n_text_layer=2, n_audio_ctx=48, n_text_ctx=24, n_vocab=100),
    "small": dict(n_mels=80, n_audio_state=768, n_audio_head=12,
                  n_audio_layer=2, n_text_state=768, n_text_head=12,
                  n_text_layer=2, n_audio_ctx=48, n_text_ctx=24, n_vocab=100),
    "large-v3-mel128": dict(n_mels=128, n_audio_state=256, n_audio_head=4,
                            n_audio_layer=2, n_text_state=256, n_text_head=4,
                            n_text_layer=2, n_audio_ctx=48, n_text_ctx=24,
                            n_vocab=100),
}


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
@pytest.mark.parametrize("size", sorted(SIZE_CASES))
def test_parity_across_sizes(size):
    kw = SIZE_CASES[size]
    torch, tmodel = _torch_whisper(kw)
    dims = WhisperDims(**kw)

    rng = np.random.default_rng(hash(size) % 2**31)
    mel = rng.standard_normal((2, kw["n_mels"], 96)).astype(np.float32)
    tokens = rng.integers(0, kw["n_vocab"], (2, 8)).astype(np.int64)

    with torch.no_grad():
        t_xa = tmodel.encoder(torch.from_numpy(mel))
        t_logits = tmodel.decoder(torch.from_numpy(tokens), t_xa)

    variables = convert_whisper(tmodel.state_dict(), dims)
    model = Whisper(dims)
    xa = model.apply(variables, jnp.asarray(mel), method=Whisper.encode)
    logits = model.apply(
        variables, jnp.asarray(tokens.astype(np.int32)), xa, method=Whisper.logits
    )
    np.testing.assert_allclose(np.asarray(xa), t_xa.numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(), atol=1e-3)


def test_size_presets_match_published_dims():
    from mere_fusion_tpu.models.whisper import LARGE_V3, SIZE_DIMS

    assert set(SIZE_DIMS) == {"tiny", "tiny.en", "base", "small", "medium",
                              "large-v2", "large-v3"}
    assert LARGE_V3.n_mels == 128 and LARGE_V3.n_vocab == 51866
    for name, d in SIZE_DIMS.items():
        assert d.n_audio_state % d.n_audio_head == 0
        assert d.n_audio_state // d.n_audio_head == 64  # all sizes use d=64


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_mel_filterbank_matches_reference_asset():
    """Our librosa-free slaney filterbank vs the npz asset OpenAI ships
    (musetalk/whisper/whisper/assets/mel_filters.npz, generated with
    librosa.filters.mel(sr=16000, n_fft=400, n_mels=80))."""
    from mere_fusion_tpu.ops.mel import WHISPER_MEL, mel_filterbank

    asset = os.path.join(REFERENCE, "musetalk", "whisper", "whisper",
                         "assets", "mel_filters.npz")
    with np.load(asset) as f:
        ref = f["mel_80"]
    np.testing.assert_allclose(mel_filterbank(WHISPER_MEL), ref, atol=1e-7)


def test_whisper_mel_config_128():
    from mere_fusion_tpu.ops import melspectrogram, whisper_mel_config

    cfg = whisper_mel_config(128)
    assert cfg.n_mels == 128 and cfg.n_fft == 400 and cfg.hop == 160
    wav = jnp.asarray(np.random.default_rng(0)
                      .standard_normal(16000).astype(np.float32) * 0.1)
    mel = np.asarray(melspectrogram(wav, cfg))
    assert mel.shape == (128, 100)
    assert np.isfinite(mel).all()


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_golden_transcript_whisper_wav():
    """BASELINE acceptance "identical transcript to reference": feed the
    reference's own data/whisper/whisper.wav through (a) the reference
    vendored torch pipeline (audio.py log_mel_spectrogram + a greedy decode
    over the torch model) and (b) our full JaxWhisperBackend.transcribe
    (ops.mel front-end + flax model + cached on-device greedy decode), at
    identical random tiny-config weights, and require the identical token
    sequence."""
    import wave

    from mere_fusion_tpu.asr.backends import JaxWhisperBackend
    from mere_fusion_tpu.models.whisper import (
        EOT,
        non_speech_token_ids,
        sot_sequence,
    )

    torch, tmodel = _torch_whisper(dict(
        n_mels=80, n_audio_ctx=1500, n_audio_state=384, n_audio_head=6,
        n_audio_layer=4, n_vocab=51865, n_text_ctx=448, n_text_state=384,
        n_text_head=6, n_text_layer=4,
    ))
    with wave.open(os.path.join(REFERENCE, "data", "whisper", "whisper.wav")) as w:
        assert w.getframerate() == 16000 and w.getnchannels() == 1
        pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    audio = pcm.astype(np.float32) / 32768.0

    try:
        from mere_fusion_tpu.utils.bpe import load_whisper_tokenizer

        tokenizer = load_whisper_tokenizer()
    except (FileNotFoundError, OSError):
        tokenizer = None

    # ---- reference side: vendored DSP + plain greedy over the torch model
    sys.path.insert(0, os.path.join(REFERENCE, "musetalk", "whisper"))
    try:
        from whisper.audio import log_mel_spectrogram, pad_or_trim
    finally:
        sys.path.pop(0)
    mel_t = log_mel_spectrogram(
        torch.from_numpy(pad_or_trim(audio)))[None]
    sot = sot_sequence(0)
    suppress = list(non_speech_token_ids(tokenizer)) if tokenizer else []
    with torch.no_grad():
        t_xa = tmodel.encoder(mel_t)
        seq = list(sot)
        for _ in range(128):
            logits = tmodel.decoder(torch.tensor([seq]), t_xa)[0, -1]
            if suppress:
                logits[suppress] = float("-inf")
            nxt = int(logits.argmax())
            if nxt == EOT:
                break
            seq.append(nxt)
    ref_tokens = seq[len(sot):]

    # ---- our side: the actual serving backend end-to-end
    variables = convert_whisper(tmodel.state_dict(), TINY)
    backend = JaxWhisperBackend(variables=variables, dims=TINY,
                                tokenizer=tokenizer, word_timestamps=False)
    res = backend.transcribe(audio)
    assert res["tokens"] == ref_tokens
    if tokenizer is not None:
        ours = "".join(tokenizer.decode([t]) for t in res["tokens"])
        theirs = "".join(tokenizer.decode([t]) for t in ref_tokens)
        assert ours == theirs
