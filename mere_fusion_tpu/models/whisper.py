"""Whisper in flax (encoder + decoder), TPU-first.

Architecture twin of the vendored OpenAI-Whisper fork the reference uses for
both transcription and MuseTalk audio features
(reference: musetalk/whisper/whisper/model.py:56-231). Two properties carried
over exactly:

- the encoder can return per-layer embeddings (pre-block input + each block
  output, stacked) — MuseTalk conditions on these
  (model.py:143-172, audio2feature.py:16-97);
- attention scales q and k by (d/h)^-0.25 each and softmaxes in fp32.

Greedy and beam decoding run fully on device as a lax.while_loop over a
static token buffer with KV caching (step_self/cross_kv below): self-
attention K/V append into a preallocated cache and cross-attention K/V are
computed once per segment, so each decode step is O(1) in sequence length.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class WhisperDims:
    n_mels: int = 80
    n_audio_ctx: int = 1500
    n_audio_state: int = 384
    n_audio_head: int = 6
    n_audio_layer: int = 4
    n_vocab: int = 51865
    n_text_ctx: int = 448
    n_text_state: int = 384
    n_text_head: int = 6
    n_text_layer: int = 4


TINY = WhisperDims()
TINY_EN = WhisperDims(n_vocab=51864)
# published OpenAI checkpoint dims (the reference server defaults to
# --model large-v2, whisper_online.py:613; WhisperDims(**ckpt["dims"]) loads
# any of these from a .pt — presets are for weightless construction/tests)
BASE = WhisperDims(n_audio_state=512, n_audio_head=8, n_audio_layer=6,
                   n_text_state=512, n_text_head=8, n_text_layer=6)
SMALL = WhisperDims(n_audio_state=768, n_audio_head=12, n_audio_layer=12,
                    n_text_state=768, n_text_head=12, n_text_layer=12)
MEDIUM = WhisperDims(n_audio_state=1024, n_audio_head=16, n_audio_layer=24,
                     n_text_state=1024, n_text_head=16, n_text_layer=24)
LARGE_V2 = WhisperDims(n_audio_state=1280, n_audio_head=20, n_audio_layer=32,
                       n_text_state=1280, n_text_head=20, n_text_layer=32)
LARGE_V3 = WhisperDims(n_mels=128, n_vocab=51866,
                       n_audio_state=1280, n_audio_head=20, n_audio_layer=32,
                       n_text_state=1280, n_text_head=20, n_text_layer=32)
SIZE_DIMS = {"tiny": TINY, "tiny.en": TINY_EN, "base": BASE, "small": SMALL,
             "medium": MEDIUM, "large-v2": LARGE_V2, "large-v3": LARGE_V3}


def sinusoids(length: int, channels: int, max_timescale: float = 10000) -> np.ndarray:
    """Sinusoidal position embedding (model.py:47-53)."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(
        np.float32
    )


class MultiHeadAttention(nn.Module):
    n_state: int
    n_head: int
    dtype: Any = jnp.float32

    def setup(self):
        dense = functools.partial(nn.Dense, self.n_state, dtype=self.dtype)
        self.query = dense(name="query")
        self.key = dense(use_bias=False, name="key")
        self.value = dense(name="value")
        self.out = dense(name="out")

    def __call__(self, x, xa=None, mask=None):
        q = self.query(x)
        k = self.key(x if xa is None else xa)
        v = self.value(x if xa is None else xa)
        return self.out(self._attend(q, k, v, mask))

    def step_self(self, x_new, k_cache, v_cache, pos):
        """Incremental self-attention: x_new [B,1,D], caches [B,ctx,D],
        pos scalar. Returns (out [B,1,D], k_cache, v_cache)."""
        q = self.query(x_new)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, self.key(x_new), (0, pos, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, self.value(x_new), (0, pos, 0)
        )
        ctx = k_cache.shape[1]
        mask = jnp.where(
            jnp.arange(ctx)[None, :] > pos, -jnp.inf, 0.0
        ).astype(jnp.float32)  # [1, ctx] broadcast over the single query
        return self.out(self._attend(q, k_cache, v_cache, mask)), k_cache, v_cache

    def cross_kv(self, xa):
        return self.key(xa), self.value(xa)

    def step_cross(self, x_new, k, v):
        q = self.query(x_new)
        return self.out(self._attend(q, k, v, None))

    def _attend(self, q, k, v, mask):
        wv, _ = self._attend_with_weights(q, k, v, mask)
        return wv

    def attention_weights(self, x, xa):
        """Cross-attention probabilities [B, h, Lq, Lk] (for DTW word
        alignment, mirroring openai-whisper's find_alignment hooks)."""
        q, k = self.query(x), self.key(xa)
        _, w = self._attend_with_weights(q, k, self.value(xa), None)
        return w

    def _attend_with_weights(self, q, k, v, mask):
        b, lq, _ = q.shape
        lk = k.shape[1]
        h = self.n_head
        scale = (self.n_state // h) ** -0.25
        q = (q * scale).reshape(b, lq, h, -1).transpose(0, 2, 1, 3)
        k = (k * scale).reshape(b, lk, h, -1).transpose(0, 2, 3, 1)
        v = v.reshape(b, lk, h, -1).transpose(0, 2, 1, 3)
        qk = jnp.einsum("bhqd,bhdk->bhqk", q, k, preferred_element_type=jnp.float32)
        if mask is not None:
            qk = qk + mask[:lq, :lk]
        w = jax.nn.softmax(qk.astype(jnp.float32), axis=-1).astype(v.dtype)
        wv = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        return wv.transpose(0, 2, 1, 3).reshape(b, lq, self.n_state), w


class ResidualAttentionBlock(nn.Module):
    n_state: int
    n_head: int
    cross_attention: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.attn = MultiHeadAttention(self.n_state, self.n_head, self.dtype, name="attn")
        self.attn_ln = nn.LayerNorm(epsilon=1e-5, name="attn_ln")
        if self.cross_attention:
            self.cross_attn = MultiHeadAttention(
                self.n_state, self.n_head, self.dtype, name="cross_attn"
            )
            self.cross_attn_ln = nn.LayerNorm(epsilon=1e-5, name="cross_attn_ln")
        self.mlp_fc1 = nn.Dense(self.n_state * 4, dtype=self.dtype, name="mlp_fc1")
        self.mlp_fc2 = nn.Dense(self.n_state, dtype=self.dtype, name="mlp_fc2")
        self.mlp_ln = nn.LayerNorm(epsilon=1e-5, name="mlp_ln")

    def __call__(self, x, xa=None, mask=None):
        x = x + self.attn(self.attn_ln(x), mask=mask)
        if self.cross_attention:
            x = x + self.cross_attn(self.cross_attn_ln(x), xa=xa)
        x = x + self.mlp_fc2(nn.gelu(self.mlp_fc1(self.mlp_ln(x)), approximate=False))
        return x

    def step(self, x_new, k_cache, v_cache, pos, cross_k, cross_v):
        a, k_cache, v_cache = self.attn.step_self(
            self.attn_ln(x_new), k_cache, v_cache, pos
        )
        x_new = x_new + a
        if self.cross_attention:
            x_new = x_new + self.cross_attn.step_cross(
                self.cross_attn_ln(x_new), cross_k, cross_v
            )
        x_new = x_new + self.mlp_fc2(
            nn.gelu(self.mlp_fc1(self.mlp_ln(x_new)), approximate=False)
        )
        return x_new, k_cache, v_cache


class AudioEncoder(nn.Module):
    dims: WhisperDims
    dtype: Any = jnp.float32

    def setup(self):
        d = self.dims
        self.conv1 = nn.Conv(
            d.n_audio_state, (3,), padding=((1, 1),), dtype=self.dtype, name="conv1"
        )
        self.conv2 = nn.Conv(
            d.n_audio_state, (3,), strides=(2,), padding=((1, 1),),
            dtype=self.dtype, name="conv2",
        )
        self.blocks = [
            ResidualAttentionBlock(
                d.n_audio_state, d.n_audio_head, dtype=self.dtype, name=f"blocks_{i}"
            )
            for i in range(d.n_audio_layer)
        ]
        self.ln_post = nn.LayerNorm(epsilon=1e-5, name="ln_post")

    def __call__(self, mel, include_embeddings: bool = False):
        """mel: [B, n_mels, T] (reference orientation). T must be
        2*n_audio_ctx (3000 for 30 s)."""
        x = mel.transpose(0, 2, 1)  # NWC for conv
        x = nn.gelu(self.conv1(x), approximate=False)
        x = nn.gelu(self.conv2(x), approximate=False)
        pos = jnp.asarray(sinusoids(self.dims.n_audio_ctx, self.dims.n_audio_state))
        x = x + pos

        embeddings = [x]
        for block in self.blocks:
            x = block(x)
            embeddings.append(x)
        out = self.ln_post(x)
        if include_embeddings:
            return out, jnp.stack(embeddings, axis=1)  # [B, L+1, T', D]
        return out


class TextDecoder(nn.Module):
    dims: WhisperDims
    dtype: Any = jnp.float32

    def setup(self):
        d = self.dims
        self.token_embedding = nn.Embed(d.n_vocab, d.n_text_state, name="token_embedding")
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (d.n_text_ctx, d.n_text_state),
            jnp.float32,
        )
        self.blocks = [
            ResidualAttentionBlock(
                d.n_text_state, d.n_text_head, cross_attention=True,
                dtype=self.dtype, name=f"blocks_{i}",
            )
            for i in range(d.n_text_layer)
        ]
        self.ln = nn.LayerNorm(epsilon=1e-5, name="ln")

    def __call__(self, tokens, xa):
        """tokens: [B, L] int32; xa: encoded audio [B, T', D]. Returns
        logits [B, L, n_vocab]."""
        L = tokens.shape[-1]
        x = self.token_embedding(tokens) + self.positional_embedding[:L]
        mask = jnp.triu(jnp.full((L, L), -jnp.inf, dtype=jnp.float32), k=1)
        for block in self.blocks:
            x = block(x, xa=xa, mask=mask)
        x = self.ln(x)
        return jnp.dot(
            x, self.token_embedding.embedding.T.astype(x.dtype),
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.float32)

    def cross_attentions(self, tokens, xa):
        """Cross-attention weights for a fixed token sequence:
        [n_layers, B, h, L, T'] — one full causal pass, used by the DTW
        word aligner (openai-whisper timing.py find_alignment analog)."""
        L = tokens.shape[-1]
        x = self.token_embedding(tokens) + self.positional_embedding[:L]
        mask = jnp.triu(jnp.full((L, L), -jnp.inf, dtype=jnp.float32), k=1)
        weights = []
        for block in self.blocks:
            weights.append(
                block.cross_attn.attention_weights(
                    block.cross_attn_ln(x + block.attn(block.attn_ln(x),
                                                       mask=mask)), xa
                )
            )
            x = block(x, xa=xa, mask=mask)
        return jnp.stack(weights)

    def init_cache(self, batch: int, max_len: int):
        d = self.dims
        shape = (d.n_text_layer, batch, max_len, d.n_text_state)
        return jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32)

    def cross_kv(self, xa):
        """Per-layer cross-attention K/V: two [L, B, T', D] stacks."""
        ks, vs = zip(*(blk.cross_attn.cross_kv(xa) for blk in self.blocks))
        return jnp.stack(ks), jnp.stack(vs)

    def step(self, token, pos, k_cache, v_cache, cross_k, cross_v):
        """One incremental decode step.

        token [B,1] int32, pos scalar int32, caches [L,B,ctx,D],
        cross_k/v [L,B,T',D]. Returns (logits [B,vocab], k_cache, v_cache).
        """
        x = self.token_embedding(token) + jax.lax.dynamic_slice_in_dim(
            self.positional_embedding, pos, 1, axis=0
        )
        new_k, new_v = [], []
        for i, blk in enumerate(self.blocks):
            x, k_i, v_i = blk.step(
                x, k_cache[i], v_cache[i], pos, cross_k[i], cross_v[i]
            )
            new_k.append(k_i)
            new_v.append(v_i)
        x = self.ln(x)
        logits = jnp.dot(
            x[:, 0], self.token_embedding.embedding.T.astype(x.dtype),
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.float32)
        return logits, jnp.stack(new_k), jnp.stack(new_v)


class Whisper(nn.Module):
    dims: WhisperDims = TINY
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = AudioEncoder(self.dims, self.dtype, name="encoder")
        self.decoder = TextDecoder(self.dims, self.dtype, name="decoder")

    def __call__(self, mel, tokens):
        return self.decoder(tokens, self.encoder(mel))

    def encode(self, mel, include_embeddings: bool = False):
        return self.encoder(mel, include_embeddings)

    def logits(self, tokens, xa):
        return self.decoder(tokens, xa)

    def cross_attentions(self, tokens, xa):
        return self.decoder.cross_attentions(tokens, xa)


# ---- special tokens (multilingual vocab; tokenizer-independent) -------------
SOT = 50258           # <|startoftranscript|>
EOT = 50257           # <|endoftext|>
SOT_PREV = 50361      # <|startofprev|>: prefixes the previous-text prompt
                      # (reference decoding.py:527-529)
TRANSCRIBE = 50359
TRANSLATE = 50358
NO_TIMESTAMPS = 50363
TIMESTAMP_BEGIN = 50364  # <|0.00|>; id t ↔ (t − TIMESTAMP_BEGIN)·0.02 s
NO_SPEECH = 50362
LANG_BASE = 50259     # <|en|> = 50259; language id = LANG_BASE + lang_index

# Whisper language codes in token-id order (<|en|>=50259 first); published
# constant from openai-whisper tokenizer.py LANGUAGES. large-v3 (n_vocab
# 51866) appends "yue" as the 100th.
LANGUAGE_CODES = (
    "en", "zh", "de", "es", "ru", "ko", "fr", "ja", "pt", "tr", "pl", "ca",
    "nl", "ar", "sv", "it", "id", "hi", "fi", "vi", "he", "uk", "el", "ms",
    "cs", "ro", "da", "hu", "ta", "no", "th", "ur", "hr", "bg", "lt", "la",
    "mi", "ml", "cy", "sk", "te", "fa", "lv", "bn", "sr", "az", "sl", "kn",
    "et", "mk", "br", "eu", "is", "hy", "ne", "mn", "bs", "kk", "sq", "sw",
    "gl", "mr", "pa", "si", "km", "sn", "yo", "so", "af", "oc", "ka", "be",
    "tg", "sd", "gu", "am", "yi", "lo", "uz", "fo", "ht", "ps", "tk", "nn",
    "mt", "sa", "lb", "my", "bo", "tl", "mg", "as", "tt", "haw", "ln", "ha",
    "ba", "jw", "su", "yue",
)


def n_language_tokens(n_vocab: int) -> int:
    """99 language tokens for the classic multilingual vocab, 100 (adds yue)
    for large-v3's 51866-token vocab."""
    return 100 if n_vocab >= 51866 else 99


def language_index(code: str, n_vocab: int = 51865) -> int:
    idx = LANGUAGE_CODES.index(code)
    if idx >= n_language_tokens(n_vocab):
        raise ValueError(f"language {code!r} not in this model's vocab")
    return idx


def sot_sequence(language_index: int = 0, task: int = TRANSCRIBE) -> list[int]:
    return [SOT, LANG_BASE + language_index, task, NO_TIMESTAMPS]


def non_speech_token_ids(tokenizer) -> tuple:
    """Token ids to suppress during transcription (the published whisper
    decoding rule: symbols and bracket/music tokens never start speech).
    Derived from the tokenizer so it works for any vocab."""
    symbols = list('"#()*+/:;<=>@[\\]^_`{|}~「」『』') + [
        "<<", ">>", "<<<", ">>>", "--", "---", "-(", "-[", "('", '("', "((",
        "))", "(((", ")))", "[[", "]]", "{{", "}}", "♪♪", "♪♪♪",
    ]
    ids = {SOT, SOT_PREV, NO_SPEECH}
    for sym in symbols + [" " + s for s in symbols]:
        try:
            toks = tokenizer.encode(sym)
        except KeyError:
            continue
        if len(toks) == 1:
            ids.add(toks[0])
    return tuple(sorted(ids))


def make_greedy_decoder(
    model: Whisper,
    variables,
    max_new_tokens: int = 128,
    suppress_tokens: Optional[tuple] = None,
):
    """Returns jitted decode(xa, prompt, prompt_len) → (tokens, length).

    Runs entirely on device: while_loop over a static [B, P+max_new] buffer,
    re-scoring the full (causal) sequence each step. prompt is a padded
    [B, P] int32 buffer; positions >= prompt_len must be EOT-padded.
    """
    variables = jax.device_put(variables)  # runtime input, not baked constant

    def decode(variables, xa, prompt, prompt_len):
        b, p = prompt.shape
        total = p + max_new_tokens
        # pad with 0, not EOT: the causal mask makes the value irrelevant, and
        # an out-of-vocab id would NaN the embedding (NaN + -inf mask = NaN)
        tokens = jnp.concatenate(
            [prompt, jnp.zeros((b, max_new_tokens), jnp.int32)], axis=1
        )

        def cond(state):
            i, _, done = state
            return jnp.logical_and(i < total, jnp.logical_not(jnp.all(done)))

        def body(state):
            i, tokens, done = state
            logits = model.apply(variables, tokens, xa, method=Whisper.logits)
            prev = jax.lax.dynamic_slice_in_dim(logits, i - 1, 1, axis=1)[:, 0]
            if suppress_tokens:
                prev = prev.at[:, jnp.asarray(suppress_tokens)].set(-jnp.inf)
            nxt = jnp.argmax(prev, axis=-1).astype(jnp.int32)
            newly_done = jnp.logical_or(done, nxt == EOT)
            nxt = jnp.where(done, EOT, nxt)
            tokens = jax.lax.dynamic_update_slice(
                tokens, nxt[:, None], (0, i.astype(jnp.int32))
            )
            return i + 1, tokens, newly_done

        i0 = jnp.asarray(prompt_len, jnp.int32)
        _, tokens, _ = jax.lax.while_loop(
            cond, body, (i0, tokens, jnp.zeros((b,), bool))
        )
        return tokens

    jitted = jax.jit(decode)
    return lambda xa, prompt, prompt_len: jitted(variables, xa, prompt, prompt_len)


def make_cached_greedy_decoder(
    model: Whisper,
    variables,
    max_new_tokens: int = 128,
    suppress_tokens: Optional[tuple] = None,
    return_scores: bool = False,
):
    """KV-cached greedy decode: one incremental decoder step per token
    (O(L) instead of the plain decoder's O(L²) re-scoring), fully on device.

    Returns decode(xa, prompt, prompt_len) → tokens [B, P+max_new]; with
    return_scores, → (tokens, avg_logprob [B], no_speech_prob [B]) where
    avg_logprob = Σ logprob(sampled) / (n_generated + 1) including the EOT
    step (openai-whisper GreedyDecoder.update/finalize semantics) and
    no_speech_prob = softmax at the <|startoftranscript|> step's output of
    the <|nospeech|> token (decoding.py probs_at_sot)."""

    def decode(variables, xa, prompt, prompt_len):
        b, p = prompt.shape
        total = p + max_new_tokens
        dec = model.dims

        def dec_apply(method, *args):
            return model.apply(
                variables, *args,
                method=lambda m, *a: getattr(m.decoder, method)(*a),
            )

        cross_k, cross_v = dec_apply("cross_kv", xa)
        k_cache, v_cache = (
            jnp.zeros((dec.n_text_layer, b, total, dec.n_text_state)),
            jnp.zeros((dec.n_text_layer, b, total, dec.n_text_state)),
        )
        tokens = jnp.concatenate(
            [prompt, jnp.full((b, max_new_tokens), EOT, jnp.int32)], axis=1
        )
        sot_step = prompt_len - 4   # sot_sequence is the prompt's 4-token tail

        def cond(state):
            i, _, _, _, done, *_ = state
            return jnp.logical_and(i < total - 1, jnp.logical_not(jnp.all(done)))

        def body(state):
            i, tokens, k_cache, v_cache, done, sum_lp, n_gen, ns = state
            tok = jax.lax.dynamic_slice(tokens, (0, i), (b, 1))
            logits, k_cache, v_cache = dec_apply(
                "step", tok, i, k_cache, v_cache, cross_k, cross_v
            )
            ns = jnp.where(
                i == sot_step,
                jax.nn.softmax(logits, axis=-1)[:, NO_SPEECH], ns,
            )
            if suppress_tokens:
                logits = logits.at[:, jnp.asarray(suppress_tokens)].set(-jnp.inf)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            in_prompt = (i + 1) < prompt_len
            gen_now = jnp.logical_and(jnp.logical_not(in_prompt),
                                      jnp.logical_not(done))
            lp = jax.nn.log_softmax(logits, axis=-1)
            tok_lp = jnp.take_along_axis(lp, nxt[:, None], axis=-1)[:, 0]
            sum_lp = sum_lp + jnp.where(gen_now, tok_lp, 0.0)
            n_gen = n_gen + jnp.where(jnp.logical_and(gen_now, nxt != EOT), 1, 0)
            keep = jax.lax.dynamic_slice(tokens, (0, i + 1), (b, 1))[:, 0]
            nxt = jnp.where(in_prompt, keep, jnp.where(done, EOT, nxt))
            newly_done = jnp.logical_or(
                done, jnp.logical_and(jnp.logical_not(in_prompt), nxt == EOT)
            )
            tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i + 1))
            return (i + 1, tokens, k_cache, v_cache, newly_done,
                    sum_lp, n_gen, ns)

        state = (
            jnp.asarray(0, jnp.int32), tokens, k_cache, v_cache,
            jnp.zeros((b,), bool), jnp.zeros((b,), jnp.float32),
            jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.float32),
        )
        _, tokens, _, _, _, sum_lp, n_gen, ns = jax.lax.while_loop(
            cond, body, state)
        if return_scores:
            return tokens, sum_lp / (n_gen + 1).astype(jnp.float32), ns
        return tokens

    variables = jax.device_put(variables)
    jitted = jax.jit(decode)
    return lambda xa, prompt, prompt_len: jitted(variables, xa, prompt, prompt_len)


def make_cached_sampling_decoder(
    model: Whisper,
    variables,
    best_of: int = 5,
    max_new_tokens: int = 128,
    suppress_tokens: Optional[tuple] = None,
):
    """KV-cached temperature sampling with ``best_of`` parallel candidates —
    the t>0 rungs of the reference's decode-fallback ladder
    (transcribe.py temperature tuple + DecodingOptions.best_of; sampling =
    Categorical(logits/T), decoding.py GreedyDecoder.update).

    The candidate dimension rides the batch axis (one xa broadcast, one
    compiled program for every temperature — sampling uses the Gumbel-argmax
    identity so T is a traced scalar). Logprob accounting uses the UNSCALED
    distribution, as the reference does.

    Returns decode(xa [1,T,D], prompt [1,P], prompt_len, temperature, seed)
    → (tokens [best_of, P+max_new], avg_logprob [best_of],
       no_speech_prob [best_of])."""
    n = best_of

    def decode(variables, xa, prompt, prompt_len, temperature, seed):
        _, p = prompt.shape
        total = p + max_new_tokens
        dec = model.dims

        def dec_apply(method, *args):
            return model.apply(
                variables, *args,
                method=lambda m, *a: getattr(m.decoder, method)(*a),
            )

        xa_n = jnp.broadcast_to(xa, (n,) + xa.shape[1:])
        cross_k, cross_v = dec_apply("cross_kv", xa_n)
        k_cache = jnp.zeros((dec.n_text_layer, n, total, dec.n_text_state))
        v_cache = jnp.zeros_like(k_cache)
        tokens = jnp.broadcast_to(
            jnp.concatenate(
                [prompt, jnp.full((1, max_new_tokens), EOT, jnp.int32)],
                axis=1),
            (n, total))
        sot_step = prompt_len - 4
        key0 = jax.random.key(seed)

        def cond(state):
            i, _, _, _, done, *_ = state
            return jnp.logical_and(i < total - 1, jnp.logical_not(jnp.all(done)))

        def body(state):
            i, tokens, k_cache, v_cache, done, sum_lp, n_gen, ns = state
            tok = jax.lax.dynamic_slice(tokens, (0, i), (n, 1))
            logits, k_cache, v_cache = dec_apply(
                "step", tok, i, k_cache, v_cache, cross_k, cross_v
            )
            ns = jnp.where(
                i == sot_step,
                jax.nn.softmax(logits, axis=-1)[:, NO_SPEECH], ns,
            )
            if suppress_tokens:
                logits = logits.at[:, jnp.asarray(suppress_tokens)].set(-jnp.inf)
            # Gumbel-argmax == Categorical(logits/T); T → 0 degrades to argmax
            g = jax.random.gumbel(jax.random.fold_in(key0, i), logits.shape)
            t = jnp.maximum(temperature, 1e-6)
            nxt = jnp.argmax(
                logits / t + jnp.where(temperature > 0, g, 0.0), axis=-1
            ).astype(jnp.int32)
            in_prompt = (i + 1) < prompt_len
            gen_now = jnp.logical_and(jnp.logical_not(in_prompt),
                                      jnp.logical_not(done))
            lp = jax.nn.log_softmax(logits, axis=-1)
            tok_lp = jnp.take_along_axis(lp, nxt[:, None], axis=-1)[:, 0]
            sum_lp = sum_lp + jnp.where(gen_now, tok_lp, 0.0)
            n_gen = n_gen + jnp.where(jnp.logical_and(gen_now, nxt != EOT), 1, 0)
            keep = jax.lax.dynamic_slice(tokens, (0, i + 1), (n, 1))[:, 0]
            nxt = jnp.where(in_prompt, keep, jnp.where(done, EOT, nxt))
            newly_done = jnp.logical_or(
                done, jnp.logical_and(jnp.logical_not(in_prompt), nxt == EOT)
            )
            tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i + 1))
            return (i + 1, tokens, k_cache, v_cache, newly_done,
                    sum_lp, n_gen, ns)

        state = (
            jnp.asarray(0, jnp.int32), tokens, k_cache, v_cache,
            jnp.zeros((n,), bool), jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.float32),
        )
        _, tokens, _, _, _, sum_lp, n_gen, ns = jax.lax.while_loop(
            cond, body, state)
        return tokens, sum_lp / (n_gen + 1).astype(jnp.float32), ns

    variables = jax.device_put(variables)
    jitted = jax.jit(decode)
    return lambda xa, prompt, prompt_len, temperature, seed: jitted(
        variables, xa, prompt, prompt_len,
        jnp.asarray(temperature, jnp.float32), seed)


def make_language_detector(model: Whisper, variables):
    """Language identification: one decoder pass over [<|sot|>], all
    non-language tokens suppressed, softmax over the language tokens
    (reference decoding.py:19-66 detect_language).

    Returns detect(xa [B,T,D]) → (lang_index [B] int32, probs [B, n_langs])."""
    nl = n_language_tokens(model.dims.n_vocab)

    def detect(variables, xa):
        b = xa.shape[0]
        logits = model.apply(
            variables, jnp.full((b, 1), SOT, jnp.int32), xa,
            method=Whisper.logits,
        )[:, 0]
        lang_logits = jax.lax.dynamic_slice_in_dim(logits, LANG_BASE, nl, -1)
        probs = jax.nn.softmax(lang_logits, axis=-1)
        return jnp.argmax(lang_logits, axis=-1).astype(jnp.int32), probs

    variables = jax.device_put(variables)
    jitted = jax.jit(detect)
    return lambda xa: jitted(variables, xa)


def make_cached_beam_decoder(
    model: Whisper,
    variables,
    beam_size: int = 5,
    max_new_tokens: int = 128,
    suppress_tokens: Optional[tuple] = None,
    return_scores: bool = False,
):
    """KV-cached beam search (reference: whisper decoding.py BeamSearchDecoder
    with patience 1.0 + MaximumLikelihoodRanker; the reference server runs
    beam 5, whisper_online.py:137).

    Fully on-device `lax.while_loop` with static shapes: `beam_size` beams as
    the batch dimension, per-step flattened top-2n expansion, finished
    hypotheses collected into a fixed n-slot pool, final pick by average
    logprob. Batch 1 input (the streaming case).

    Returns decode(xa [1,T,D], prompt [1,P], prompt_len) → tokens [1, P+max_new].
    """
    n = beam_size

    def decode(variables, xa, prompt, prompt_len):
        _, p = prompt.shape
        total = p + max_new_tokens
        dims = model.dims

        def dec_apply(method, *args):
            return model.apply(
                variables, *args,
                method=lambda m, *a: getattr(m.decoder, method)(*a),
            )

        xa_n = jnp.broadcast_to(xa, (n,) + xa.shape[1:])
        cross_k, cross_v = dec_apply("cross_kv", xa_n)
        k_cache = jnp.zeros((dims.n_text_layer, n, total, dims.n_text_state))
        v_cache = jnp.zeros_like(k_cache)
        tokens = jnp.broadcast_to(
            jnp.concatenate(
                [prompt, jnp.full((1, max_new_tokens), EOT, jnp.int32)], axis=1
            ),
            (n, total),
        )
        # identical beams: keep only beam 0 alive at the first expansion
        sum_lp = jnp.where(jnp.arange(n) == 0, 0.0, -1e9)
        fin_tokens = jnp.full((n, total), EOT, jnp.int32)
        fin_scores = jnp.full((n,), -jnp.inf)      # avg logprob of finished
        fin_count = jnp.asarray(0, jnp.int32)
        sot_step = prompt_len - 4

        def cond(state):
            i, *_, fin_count, _ns = state
            return jnp.logical_and(i < total - 1, fin_count < n)

        def body(state):
            (i, tokens, sum_lp, k_cache, v_cache,
             fin_tokens, fin_scores, fin_count, ns) = state
            tok = jax.lax.dynamic_slice(tokens, (0, i), (n, 1))
            logits, k_cache, v_cache = dec_apply(
                "step", tok, i, k_cache, v_cache, cross_k, cross_v
            )
            ns = jnp.where(
                i == sot_step,
                jax.nn.softmax(logits[0], axis=-1)[NO_SPEECH], ns,
            )
            if suppress_tokens:
                logits = logits.at[:, jnp.asarray(suppress_tokens)].set(-jnp.inf)
            lp = jax.nn.log_softmax(logits, axis=-1)            # [n, V]
            v = lp.shape[-1]
            flat = (sum_lp[:, None] + lp).reshape(-1)           # [n·V]
            top_lp, top_idx = jax.lax.top_k(flat, 2 * n)
            src = (top_idx // v).astype(jnp.int32)
            tok_id = (top_idx % v).astype(jnp.int32)

            in_prompt = (i + 1) < prompt_len
            is_eot = jnp.logical_and(tok_id == EOT,
                                     jnp.logical_not(in_prompt))
            # finished candidates → pool, ranked by avg logprob over the
            # generated region (MaximumLikelihoodRanker, length penalty None)
            gen_len = jnp.maximum(i + 1 - prompt_len, 1).astype(jnp.float32)
            cand_avg = jnp.where(is_eot, top_lp / gen_len, -jnp.inf)
            # merge the best finished candidates into the n-slot pool
            cand_src_tokens = tokens[src]
            all_scores = jnp.concatenate([fin_scores, cand_avg])
            all_tokens = jnp.concatenate(
                [fin_tokens,
                 jax.lax.dynamic_update_slice(
                     cand_src_tokens,
                     jnp.full((2 * n, 1), EOT, jnp.int32), (0, i + 1))]
            )
            keep = jax.lax.top_k(all_scores, n)[1]
            fin_scores = all_scores[keep]
            fin_tokens = all_tokens[keep]
            fin_count = jnp.minimum(
                fin_count + is_eot.sum().astype(jnp.int32), n
            )

            # continue with the best n non-finished candidates
            order = jnp.argsort(jnp.where(is_eot, jnp.inf, -top_lp))
            live = order[:n]
            src_l, tok_l, lp_l = src[live], tok_id[live], top_lp[live]
            keep_tok = jax.lax.dynamic_slice(tokens, (0, i + 1), (n, 1))[:, 0]
            nxt = jnp.where(in_prompt, keep_tok, tok_l)
            new_tokens = jnp.where(in_prompt, tokens, tokens[src_l])
            new_tokens = jax.lax.dynamic_update_slice(
                new_tokens, nxt[:, None], (0, i + 1)
            )
            reorder = lambda c: jnp.where(in_prompt, c, c[:, src_l])
            sum_lp = jnp.where(in_prompt, sum_lp, lp_l)
            return (i + 1, new_tokens, sum_lp, reorder(k_cache),
                    reorder(v_cache), fin_tokens, fin_scores, fin_count, ns)

        state = (jnp.asarray(0, jnp.int32), tokens, sum_lp, k_cache, v_cache,
                 fin_tokens, fin_scores, fin_count,
                 jnp.asarray(0.0, jnp.float32))
        (i, tokens, sum_lp, _, _, fin_tokens, fin_scores, fin_count, ns) = (
            jax.lax.while_loop(cond, body, state)
        )
        # fall back to the best live beam if nothing finished
        gen_len = jnp.maximum(i - prompt_len, 1).astype(jnp.float32)
        live_best = tokens[jnp.argmax(sum_lp)]
        best = jnp.where(
            fin_count > 0, fin_tokens[jnp.argmax(fin_scores)], live_best
        )
        if return_scores:
            avg = jnp.where(fin_count > 0, jnp.max(fin_scores),
                            jnp.max(sum_lp) / gen_len)
            return best[None], avg[None], ns[None]
        return best[None]

    variables = jax.device_put(variables)
    jitted = jax.jit(decode)
    return lambda xa, prompt, prompt_len: jitted(variables, xa, prompt, prompt_len)
