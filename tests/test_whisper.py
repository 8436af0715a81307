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
