"""Mesh-sharded batch serving: Synthesizer(mesh=...) shards the padded
request batch over the mesh's data axis and must reproduce the
single-device path (same params, same rng) to float tolerance.

The reference serves single-GPU only (reference: synthesizer.py); the mesh
path is the TPU-native scale-out for batch serving, exercised here on the
8-virtual-device CPU mesh from conftest.
"""

import jax
import numpy as np
import pytest

import nspeech_tpu.config as config
from nspeech_tpu.models import create_model
from nspeech_tpu.parallel.mesh import make_mesh
from nspeech_tpu.serving import Synthesizer
from nspeech_tpu.train import create_state, make_optimizer

TEXTS = ["the birch canoe slid", "glue the sheet", "a b c"]


def _micro_cfg():
    cfg = config.load_config("taco1")
    cfg.parse(
        "batch_size=2,max_iters=4,encoder_cbhg_banks=1,post_cbhg_banks=1,"
        "attention_dim=16,decoder_dim=16,embedding_dim=16,"
        "griffin_lim_iters=2")
    cfg.encoder_prenet = [16, 16]
    cfg.encoder_cbhg_bank_sizes = [16]
    cfg.post_cbhg_bank_sizes = [80]
    cfg.num_speakers = 1
    return cfg


def _variables(cfg):
    model = create_model("taco1", cfg)
    tx, _ = make_optimizer(cfg, "taco1")
    st = create_state(model, tx, jax.random.PRNGKey(0))
    return model, st.params, st.bn_state


@pytest.mark.smoke
def test_mesh_serving_matches_single_device():
    cfg = _micro_cfg()
    model, params, bn_state = _variables(cfg)

    plain = Synthesizer(cfg, text_bucket=16)
    plain.set_variables(params, bn_state, model=model)
    w0, m0, l0 = plain.synthesize_batch(TEXTS)

    mesh = make_mesh(jax.devices())
    sharded = Synthesizer(cfg, text_bucket=16, mesh=mesh)
    sharded.set_variables(params, bn_state, model=model)
    w1, m1, l1 = sharded.synthesize_batch(TEXTS)

    assert m1.shape == m0.shape and l1.shape == l0.shape
    np.testing.assert_allclose(m0, m1, atol=1e-5)
    np.testing.assert_allclose(l0, l1, atol=1e-5)
    # waveform post-processing is float-sensitive near the endpoint trim;
    # lengths must agree and samples match to tolerance
    for a, b in zip(w0, w1):
        assert len(a) == len(b)
        np.testing.assert_allclose(a, b, atol=1e-4)


@pytest.mark.smoke
def test_mesh_serving_pads_to_data_axis():
    """A 3-text request on an 8-way data mesh pads to 8 rows; the padding
    rows start finished so results still line up row-for-row."""
    cfg = _micro_cfg()
    model, params, bn_state = _variables(cfg)
    mesh = make_mesh(jax.devices())
    synth = Synthesizer(cfg, text_bucket=16, mesh=mesh)
    synth.set_variables(params, bn_state, model=model)

    wavs, mels, lins = synth.synthesize_batch(TEXTS[:1])
    assert len(wavs) == 1 and mels.shape[0] == 1 and lins.shape[0] == 1

    # model-parallel axis present but unused by serving: still shards batch
    mesh42 = make_mesh(jax.devices(), model_parallel=2)
    synth42 = Synthesizer(cfg, text_bucket=16, mesh=mesh42)
    synth42.set_variables(params, bn_state, model=model)
    wavs2, mels2, _ = synth42.synthesize_batch(TEXTS)
    assert len(wavs2) == len(TEXTS) and mels2.shape[0] == len(TEXTS)
