import struct

import numpy as np
import pytest

from mere_fusion_tpu.audio import deepspeech as ds


def test_mfcc_shapes_and_energy():
    rng = np.random.default_rng(0)
    audio = (rng.uniform(-0.3, 0.3, 16000) * 32768).astype(np.int16)
    feat = ds.mfcc_psf(audio)
    # psf framing: 1 + ceil((16000-400)/160) = 99 frames, 26 cepstra
    assert feat.shape == (99, 26)
    assert np.isfinite(feat).all()
    # c0 is log total frame energy (appendEnergy=True)
    frames = np.lib.stride_tricks.sliding_window_view(
        np.append(audio[0], audio[1:] - 0.97 * audio[:-1].astype(np.float64)),
        400)[::160]  # 98 full frames; psf zero-pads a 99th
    pspec = (np.abs(np.fft.rfft(frames, 512)) ** 2) / 512
    np.testing.assert_allclose(feat[:98, 0], np.log(pspec.sum(1)), rtol=1e-6)


def test_mfcc_parity_with_python_speech_features():
    psf = pytest.importorskip("python_speech_features")
    rng = np.random.default_rng(1)
    audio = (rng.uniform(-0.3, 0.3, 8000) * 32768).astype(np.int16)
    want = psf.mfcc(signal=audio, samplerate=16000, numcep=26)
    got = ds.mfcc_psf(audio)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_input_vector_layout():
    rng = np.random.default_rng(0)
    audio = (rng.uniform(-0.3, 0.3, 16000) * 32768).astype(np.int16)
    vec = ds.input_vector(audio)
    # 99 mfcc frames -> ::2 -> 50 strides at 50 Hz; 19*26 = 494 dims
    assert vec.shape == (50, 494)
    np.testing.assert_allclose(vec.mean(), 0.0, atol=1e-10)
    np.testing.assert_allclose(vec.std(), 1.0, rtol=1e-10)
    # middle block of window t equals the (normalized) mfcc frame 2t
    feat = ds.mfcc_psf(audio)[::2]
    full = np.concatenate([np.zeros((9, 26)), feat, np.zeros((9, 26))])
    wins = np.stack([full[i:i + 19].ravel() for i in range(50)])
    np.testing.assert_allclose(vec, (wins - wins.mean()) / wins.std())


def test_lstm_matches_manual_tf_semantics():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    units, inp, T = 4, 3, 5
    kernel = rng.standard_normal((inp + units, 4 * units)).astype(np.float32)
    bias = rng.standard_normal(4 * units).astype(np.float32)
    xs = rng.standard_normal((T, inp)).astype(np.float32)

    got = np.asarray(ds._lstm_scan(jnp.asarray(kernel), jnp.asarray(bias),
                                   jnp.asarray(xs)))

    sigmoid = lambda z: 1 / (1 + np.exp(-z))
    c = h = np.zeros(units)
    want = []
    for t in range(T):
        z = np.concatenate([xs[t], h]) @ kernel + bias
        i, j, f, o = np.split(z, 4)
        c = c * sigmoid(f + 1.0) + sigmoid(i) * np.tanh(j)  # forget_bias=1
        h = np.tanh(c) * sigmoid(o)
        want.append(h)
    np.testing.assert_allclose(got, np.array(want), rtol=2e-5, atol=1e-6)


def test_network_and_full_pipeline_shapes():
    # tiny random net but real code path on device
    params = ds.init_params()
    fn = ds.deepspeech_logits_fn(params=params)
    rng = np.random.default_rng(0)
    pcm = rng.uniform(-0.3, 0.3, 16000).astype(np.float32)
    logits = fn(pcm)
    assert logits.shape == (50, 29)
    assert np.isfinite(logits).all()

    # full conv pipeline: 1 s at 25 fps video -> 25 windows of [16, 29]
    net = lambda vec: np.asarray(
        ds.deepspeech_apply(
            {k: np.asarray(v) for k, v in params.items()}, vec))
    wins = ds.conv_audio_to_deepspeech(pcm, 16000, net, num_frames=25)
    assert wins.shape[1:] == (16, 29)
    assert abs(wins.shape[0] - 25) <= 1  # stride loop drops the last window


def test_interpolate_features_matches_np_interp():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((50, 3))
    out = ds.interpolate_features(feats, 50.0, 25.0, 25)
    ot = np.arange(25) / 25.0
    it = np.arange(50) / 50.0
    for c in range(3):
        np.testing.assert_allclose(out[:, c], np.interp(ot, it, feats[:, c]))


# --- protobuf wire-format parser -------------------------------------------

def _varint(v: int) -> bytes:
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _len_delim(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _tensor_proto(arr: np.ndarray) -> bytes:
    # dtype (field 1 varint): DT_FLOAT = 1
    msg = _varint(1 << 3) + _varint(1)
    # tensor_shape (field 2): dims as TensorShapeProto.dim (field 2) each
    # with size (field 1 varint)
    shape_msg = b""
    for d in arr.shape:
        shape_msg += _len_delim(2, _varint(1 << 3) + _varint(d))
    msg += _len_delim(2, shape_msg)
    # tensor_content (field 4 bytes)
    msg += _len_delim(4, arr.astype("<f4").tobytes())
    return msg


def _const_node(name: str, arr: np.ndarray) -> bytes:
    node = _len_delim(1, name.encode())          # name
    node += _len_delim(2, b"Const")              # op
    attr_value = _len_delim(8, _tensor_proto(arr))   # AttrValue.tensor
    entry = _len_delim(1, b"value") + _len_delim(2, attr_value)
    node += _len_delim(5, entry)                 # attr map entry
    return _len_delim(1, node)                   # GraphDef.node


def test_graphdef_parser_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((3, 4)).astype(np.float32)
    b = rng.standard_normal(5).astype(np.float32)
    pb = (_const_node("h1", a)
          + _const_node("bidirectional_rnn/fw/basic_lstm_cell/kernel", b)
          # non-Const node must be ignored
          + _len_delim(1, _len_delim(1, b"x") + _len_delim(2, b"Placeholder")))
    path = tmp_path / "g.pb"
    path.write_bytes(pb)
    consts = ds.read_graph_constants(str(path))
    assert set(consts) == {"h1", "bidirectional_rnn/fw/basic_lstm_cell/kernel"}
    np.testing.assert_allclose(consts["h1"], a)
    np.testing.assert_allclose(
        consts["bidirectional_rnn/fw/basic_lstm_cell/kernel"], b)


def test_params_from_graph_full_mapping(tmp_path):
    rng = np.random.default_rng(0)
    consts = {}
    pb = b""
    for key, shape in ds.PARAM_SHAPES.items():
        if key.startswith("lstm_"):
            _, direction, leaf = key.split("_")
            name = f"bidirectional_rnn/{direction}/basic_lstm_cell/{leaf}"
        else:
            name = key
        # tiny stand-in arrays with the right rank; shape check patched below
        consts[name] = rng.standard_normal(shape[-1]).astype(np.float32) \
            if len(shape) == 1 else \
            rng.standard_normal((2, shape[-1])).astype(np.float32)
    # build real-shape arrays only for the shape assertion to pass: use the
    # declared shapes directly (small enough: largest is 6144x8192 f32 =
    # 200 MB — too big for a test, so monkeypatch the shape table)
    small = {k: ((2, 3) if len(s) == 2 else (3,))
             for k, s in ds.PARAM_SHAPES.items()}
    orig = ds.PARAM_SHAPES
    ds.PARAM_SHAPES = small
    try:
        for key in small:
            if key.startswith("lstm_"):
                _, direction, leaf = key.split("_")
                name = f"bidirectional_rnn/{direction}/basic_lstm_cell/{leaf}"
            else:
                name = key
            arr = rng.standard_normal(small[key]).astype(np.float32)
            consts[name] = arr
            pb += _const_node(name, arr)
        path = tmp_path / "ds.pb"
        path.write_bytes(pb)
        params = ds.params_from_graph(ds.read_graph_constants(str(path)))
        assert set(params) == set(small)
        np.testing.assert_allclose(params["h1"], consts["h1"])
        np.testing.assert_allclose(
            params["lstm_bw_bias"],
            consts["bidirectional_rnn/bw/basic_lstm_cell/bias"])
    finally:
        ds.PARAM_SHAPES = orig


def test_numpy_host_path_matches_jax():
    """deepspeech_apply_np (the live-serving host path) must match the
    jitted deepspeech_apply bit-close."""
    import jax.numpy as jnp

    from mere_fusion_tpu.audio.deepspeech import (
        deepspeech_apply,
        deepspeech_apply_np,
        init_params,
    )

    params = init_params(np.random.default_rng(7), scale=0.05)
    x = np.random.default_rng(8).standard_normal((27, 494)).astype(np.float32)
    want = np.asarray(deepspeech_apply(
        {k: jnp.asarray(v) for k, v in params.items()}, jnp.asarray(x)))
    got = deepspeech_apply_np(params, x)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_logits_fn_host_device_agree():
    from mere_fusion_tpu.audio.deepspeech import deepspeech_logits_fn, init_params

    params = init_params(np.random.default_rng(9), scale=0.05)
    pcm = (0.3 * np.sin(np.linspace(0, 440 * 6.28, 8960))).astype(np.float32)
    host = deepspeech_logits_fn(params=params, device="host")(pcm)
    dev = deepspeech_logits_fn(params=params, device=None)(pcm)
    assert host.shape == dev.shape
    np.testing.assert_allclose(host, dev, atol=3e-5)


def test_bf16_serving_dtype_close_to_f32():
    """The live-serving bf16 path (engines/__init__.make_nerf_featurizer,
    deepspeech_logits_fn(return_device=True) default) must stay close to
    the f32 reference logits: same argmax phonemes, small residual.

    bf16 feature extraction is OUR serving-side optimization, not reference
    behavior (the reference extracts DeepSpeech logits with a float32 TF
    graph; its fp16 AMP covers only the downstream NeRF nets) — hence the
    bound here, at a deliberately hard regime: trained-magnitude weight
    scales (LSTM gates near saturation) and a speech-like signal (chirped
    harmonics + amplitude-modulated noise), not a pure tone. Real
    frozen-graph weights would tighten this further once a .pb fixture is
    available. Scale 0.1 puts the f32 logits at trained magnitude (~30,
    matching real DeepSpeech logit range); larger scales drive the random
    LSTM into chaotic blow-up (logits >100) that no trained net exhibits."""
    from mere_fusion_tpu.audio.deepspeech import deepspeech_logits_fn, init_params

    rng = np.random.default_rng(11)
    t = np.linspace(0.0, 0.56, 8960)
    f0 = 110 * (1 + 0.8 * t)                      # pitch sweep
    pcm = sum(0.15 / k * np.sin(2 * np.pi * k * f0 * t) for k in (1, 2, 3))
    pcm += (0.05 * np.sin(2 * np.pi * 4.0 * t) + 0.05) \
        * rng.standard_normal(t.shape)            # AM fricative-like noise
    pcm = pcm.astype(np.float32)
    for scale in (0.05, 0.1):
        params = init_params(np.random.default_rng(11), scale=scale)
        f32 = deepspeech_logits_fn(params=params, device=None)(pcm)
        bf16 = deepspeech_logits_fn(params=params, device=None,
                                    compute_dtype="bfloat16")(pcm)
        assert f32.shape == bf16.shape
        s = np.abs(f32).max()
        assert np.abs(bf16 - f32).max() <= 0.05 * s, (
            scale, np.abs(bf16 - f32).max(), s)
        # dominant phoneme per frame unchanged
        assert (np.argmax(f32, -1) == np.argmax(bf16, -1)).mean() >= 0.95, scale
