"""End-to-end text -> waveform pipeline test: Tacotron-2 mels driving the
mel-conditioned WaveNet vocoder (BASELINE config #4)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from nspeech_tpu.config import load_config
from nspeech_tpu.models import create_model
from nspeech_tpu.serving import Synthesizer, TextToSpeech, WaveNetVocoder


def test_text_to_waveform_via_wavenet():
    # Tiny acoustic model
    cfg = load_config("taco2")
    cfg.parse(
        "max_iters=3,encoder_conv_layers=1,postnet_conv_layers=1,"
        "expand_conv_layers=1,encoder_conv_channels=16,attention_dim=16,"
        "postnet_conv_channels=16,expand_conv_channels=16,"
        "decoder_lstm_units=16,encoder_lstm_units=8,expand_lstm_units=8,"
        "embedding_dim=16,griffin_lim_iters=1")
    model = create_model("taco2", cfg)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    synth = Synthesizer(cfg, text_bucket=16)
    synth.set_variables(params, bn_state, model=model)

    # Tiny mel-conditioned vocoder
    vcfg = load_config("wavenet")
    vcfg.parse("dilations_length=3,dilations_depth=1,residual_channels=8,"
               "dilation_channels=8,skip_channels=16,"
               "quantization_channels=64,lc_channels=80,batch_size=1")
    net = create_model("wavenet", vcfg)
    vparams = net.init(jax.random.PRNGKey(1))
    vocoder = WaveNetVocoder(vcfg).set_variables(net, vparams)

    tts = TextToSpeech(synth, vocoder)
    wav, mel, lin = tts.synthesize("hi there")
    hop = 250  # 12.5 ms at 20 kHz
    assert mel.shape == (15, 80)
    # Only the speech-bearing frames (per the Griffin-Lim endpoint) are
    # vocoded — no trailing post-stop garbage at full max_iters length.
    assert 0 < wav.shape[0] <= 15 * hop
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() <= 1.0  # mu-law decoded range

    # Griffin-Lim fallback when no vocoder
    tts_gl = TextToSpeech(synth, None)
    wav_gl, _, _ = tts_gl.synthesize("hi there")
    assert wav_gl.ndim == 1 and np.isfinite(wav_gl).all()
    # vocoded length tracks the GL endpoint to within one frame
    assert abs(wav.shape[0] - wav_gl.shape[0]) <= hop


def test_batch_text_to_waveform_via_wavenet():
    """N texts -> one padded acoustic forward -> one batched vocoder chain."""
    cfg = load_config("taco2")
    cfg.parse(
        "max_iters=3,encoder_conv_layers=1,postnet_conv_layers=1,"
        "expand_conv_layers=1,encoder_conv_channels=16,attention_dim=16,"
        "postnet_conv_channels=16,expand_conv_channels=16,"
        "decoder_lstm_units=16,encoder_lstm_units=8,expand_lstm_units=8,"
        "embedding_dim=16,griffin_lim_iters=1")
    model = create_model("taco2", cfg)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    synth = Synthesizer(cfg, text_bucket=16)
    synth.set_variables(params, bn_state, model=model)

    vcfg = load_config("wavenet")
    vcfg.parse("dilations_length=3,dilations_depth=1,residual_channels=8,"
               "dilation_channels=8,skip_channels=16,"
               "quantization_channels=64,lc_channels=80,batch_size=1")
    net = create_model("wavenet", vcfg)
    vocoder = WaveNetVocoder(vcfg).set_variables(net, net.init(jax.random.PRNGKey(1)))

    tts = TextToSpeech(synth, vocoder)
    wavs, mels, lins = tts.synthesize_batch(["hi there", "bye now"])
    assert len(wavs) == 2 and mels.shape[0] == 2
    hop = 250
    for w in wavs:
        assert 0 < w.shape[0] <= mels.shape[1] * hop
        assert np.isfinite(w).all() and np.abs(w).max() <= 1.0


@pytest.mark.smoke
def test_device_upsample_matches_host(rng):
    """The on-device mel upsampler must match the host np.interp version
    used by the training feeder."""
    from nspeech_tpu.data.wavenet_feeder import upsample_frames
    from nspeech_tpu.serving.pipeline import _upsample_on_device

    frames = rng.random((7, 5)).astype(np.float32)
    hop, length = 4, 7 * 4
    host = upsample_frames(frames, hop, length)
    dev = np.asarray(_upsample_on_device(jnp.asarray(frames[None]),
                                         hop, length))[0]
    np.testing.assert_allclose(host, dev, rtol=1e-6, atol=1e-6)


def test_want_features_mel_skips_linear():
    """want_features='mel' pulls the mel (the vocoder consumes it) but
    not the full-resolution linear — the dominant per-request transfer."""
    import jax
    import numpy as np

    from nspeech_tpu.config import load_config
    from nspeech_tpu.models import create_model
    from nspeech_tpu.serving import Synthesizer

    cfg = load_config("taco2")
    cfg.parse("max_iters=6,outputs_per_step=2,encoder_conv_layers=1,"
              "postnet_conv_layers=2,postnet_conv_width=3,"
              "expand_conv_layers=1,encoder_conv_channels=16,"
              "attention_dim=16,postnet_conv_channels=16,"
              "expand_conv_channels=16,decoder_lstm_units=16,"
              "encoder_lstm_units=8,expand_lstm_units=8,embedding_dim=16,"
              "griffin_lim_iters=1")
    model = create_model("taco2", cfg)
    params, bn = model.init(jax.random.PRNGKey(0))
    syn = Synthesizer(cfg, text_bucket=16).set_variables(params, bn,
                                                         model=model)
    wav_all, mel_all, lin_all = syn.synthesize("hello")
    wav, mel, lin = syn.synthesize("hello", want_features="mel")
    assert lin is None and lin_all is not None
    np.testing.assert_array_equal(mel, mel_all)
    np.testing.assert_array_equal(wav, wav_all)
    wav2, mel2, lin2 = syn.synthesize("hello", want_features=False)
    assert mel2 is None and lin2 is None
    np.testing.assert_array_equal(wav2, wav_all)
