"""Reference-checkpoint import: from-spec bundle reader + WaveNet mapping.

Two independent validations:

1. The pure-Python TF bundle reader (``nspeech_tpu/migrate/tfbundle.py``)
   is checked bit-for-bit against the installed TensorFlow's own C++
   checkpoint reader on bundles TF itself wrote — a genuinely
   independent implementation, so the from-spec claim is not circular.
2. The REFERENCE WaveNet itself (/root/reference/neural_speech/models/
   wavenet.py) is built and run under ``tf.compat.v1`` (its
   ``tf.contrib`` use is a single initializer, stubbed here), a real
   ``tf.train.Saver`` checkpoint is saved, imported through our mapper,
   and the imported JAX model's logits are asserted equal to the
   reference session's logits — direct numerical parity with the
   upstream implementation under shared weights.

TensorFlow-dependent tests skip cleanly when TF is absent; the mapper
itself (dict-input tests below) and the hostile-input reader tests run
everywhere.
"""

import contextlib
import importlib.util
import io
import struct

import numpy as np
import pytest

from nspeech_tpu.migrate import (BundleError, ImportError_, TFBundleReader,
                                 check_dilations, import_wavenet)
from nspeech_tpu.migrate.tfbundle import masked_crc32c, snappy_decompress

REF_WAVENET = "/root/reference/neural_speech/models/wavenet.py"

try:
    import tensorflow as tf
    v1 = tf.compat.v1
except ImportError:  # mapper/reader unit tests still run without TF
    tf = None
    v1 = None

needs_tf = pytest.mark.skipif(tf is None, reason="tensorflow not installed")


# ---------------------------------------------------------------------------
# Fixtures: a real reference-WaveNet Saver checkpoint + its session logits
# ---------------------------------------------------------------------------

class _RefHP:
    """Reduced config exercising every import branch (biases + gc)."""
    batch_size = 2
    dilations_depth = 2
    dilations_length = 3
    filter_width = 2
    residual_channels = 8
    dilation_channels = 8
    quantization_channels = 32
    skip_channels = 16
    use_biases = True
    scalar_input = False
    initial_filter_width = 32
    gc_channels = 4
    gc_category_cardinality = 3
    lc_channels = None


def _load_reference_wavenet():
    """Import the reference module and point its ``tf`` at compat.v1.

    The module's only graph-build-time contrib use is
    ``tf.contrib.layers.xavier_initializer_conv2d`` (reference:
    wavenet.py:15); everything else is core TF1 API available under
    ``tf.compat.v1``.
    """
    class _Layers:
        @staticmethod
        def xavier_initializer_conv2d():
            return v1.glorot_uniform_initializer()

    class _Contrib:
        layers = _Layers()

    class _TFProxy:
        def __init__(self, base):
            object.__setattr__(self, "_base", base)

        def __getattr__(self, name):
            if name == "contrib":
                return _Contrib()
            return getattr(self._base, name)

    spec = importlib.util.spec_from_file_location("_ref_wavenet", REF_WAVENET)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.tf = _TFProxy(v1)
    return mod


@pytest.fixture(scope="module")
def ref_ckpt(tmp_path_factory):
    """(prefix, codes, gc_ids, reference_logits) from a real Saver save."""
    if tf is None:
        pytest.skip("tensorflow not installed")
    v1.disable_eager_execution()
    mod = _load_reference_wavenet()
    rng = np.random.default_rng(42)
    T = 40
    codes = rng.integers(0, _RefHP.quantization_channels,
                         size=(2, T)).astype(np.int32)
    gc_ids = np.array([1, 2], np.int32)

    graph = v1.Graph()
    with graph.as_default():
        # The reference's layer builders print() tensors; keep output clean.
        with contextlib.redirect_stdout(io.StringIO()):
            net = mod.WaveNetModel(_RefHP())
            codes_ph = v1.placeholder(tf.int32, [2, T])
            gc_ph = v1.placeholder(tf.int32, [2])
            raw = net._create_network(net._one_hot(codes_ph),
                                      net._embed_gc(gc_ph), None)
        saver = v1.train.Saver()
        with v1.Session(graph=graph) as sess:
            sess.run(v1.global_variables_initializer())
            ref_logits = sess.run(raw, {codes_ph: codes, gc_ph: gc_ids})
            prefix = saver.save(
                sess, str(tmp_path_factory.mktemp("refck") / "model.ckpt"),
                global_step=777, write_meta_graph=False)
    return prefix, codes, gc_ids, ref_logits


# ---------------------------------------------------------------------------
# 1. Bundle reader vs TensorFlow's own reader
# ---------------------------------------------------------------------------

def test_bundle_reader_matches_tf(ref_ckpt):
    prefix = ref_ckpt[0]
    reader = TFBundleReader(prefix)
    ck = tf.train.load_checkpoint(prefix)
    names = reader.variable_names()
    assert "wavenet/causal_layer/filter" in names
    assert "wavenet/dilated_stack/layer0/Variable_3" in names  # bias quirk
    for name in names:
        mine = reader.get_tensor(name)
        theirs = ck.get_tensor(name)
        assert mine.dtype == theirs.dtype, name
        np.testing.assert_array_equal(mine, theirs, err_msg=name)


@needs_tf
def test_bundle_reader_mixed_dtypes(tmp_path):
    v1.disable_eager_execution()
    graph = v1.Graph()
    with graph.as_default():
        v1.get_variable("f64", shape=[5], dtype=tf.float64,
                        initializer=v1.random_normal_initializer(seed=3))
        v1.get_variable("i64", shape=[2, 3], dtype=tf.int64,
                        initializer=v1.constant_initializer(-7))
        v1.get_variable("i32", shape=[4], dtype=tf.int32,
                        initializer=v1.constant_initializer(9))
        saver = v1.train.Saver()
        with v1.Session(graph=graph) as sess:
            sess.run(v1.global_variables_initializer())
            prefix = saver.save(sess, str(tmp_path / "m.ckpt"),
                                write_meta_graph=False)
    reader = TFBundleReader(prefix)
    ck = tf.train.load_checkpoint(prefix)
    for name in reader.variable_names():
        mine = reader.get_tensor(name)
        np.testing.assert_array_equal(mine, ck.get_tensor(name), err_msg=name)
        assert mine.dtype == ck.get_tensor(name).dtype


def test_bundle_reader_rejects_corruption(ref_ckpt, tmp_path):
    prefix = ref_ckpt[0]
    reader = TFBundleReader(prefix)
    name = "wavenet/causal_layer/filter"
    entry = reader._entry(name)

    # Flip a payload byte -> per-tensor checksum failure.
    data_path = f"{prefix}.data-00000-of-00001"
    blob = bytearray(open(data_path, "rb").read())
    blob[entry.offset] ^= 0xFF
    bad_prefix = str(tmp_path / "corrupt.ckpt")
    open(bad_prefix + ".index", "wb").write(open(prefix + ".index", "rb").read())
    open(bad_prefix + ".data-00000-of-00001", "wb").write(bytes(blob))
    with pytest.raises(BundleError, match="checksum"):
        TFBundleReader(bad_prefix).get_tensor(name)

    # Truncate / garble the index -> structural failures, never garbage out.
    idx = open(prefix + ".index", "rb").read()
    short = str(tmp_path / "short.ckpt")
    open(short + ".index", "wb").write(idx[:20])
    with pytest.raises(BundleError):
        TFBundleReader(short)
    nomagic = str(tmp_path / "nomagic.ckpt")
    open(nomagic + ".index", "wb").write(idx[:-8] + b"\x00" * 8)
    with pytest.raises(BundleError, match="magic"):
        TFBundleReader(nomagic)


def test_masked_crc32c_known_vector():
    # CRC32C("123456789") = 0xE3069283 (Castagnoli reference vector);
    # LevelDB masking is rot15 + 0xa282ead8.
    crc = 0xE3069283
    expected = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert masked_crc32c(b"123456789") == expected


def test_snappy_decompress_spec_vectors():
    # Hand-assembled per the snappy format description: a literal then an
    # overlapping copy (offset 2, length 6) producing "ababababab".
    # varint(10), literal tag len=4 ("abab"), copy1 tag: len 6 off 2.
    comp = bytes([10, (4 - 1) << 2, ord("a"), ord("b"), ord("a"), ord("b"),
                  ((6 - 4) << 2) | 1, 2])
    assert snappy_decompress(comp) == b"ababababab"
    with pytest.raises(BundleError):
        snappy_decompress(bytes([4, ((6 - 4) << 2) | 1, 9]))  # bad offset
    # Copies whose offset bytes are truncated must raise, not decode a
    # partial little-endian offset into plausible garbage.
    prefix = bytes([10, (2 - 1) << 2, ord("a"), ord("b")])
    with pytest.raises(BundleError, match="truncated"):
        snappy_decompress(prefix + bytes([(3 - 1) << 2 | 2, 2]))  # 1 of 2
    with pytest.raises(BundleError, match="truncated"):
        snappy_decompress(prefix + bytes([(3 - 1) << 2 | 3, 2, 0]))  # 2 of 4
    with pytest.raises(BundleError, match="truncated"):
        snappy_decompress(prefix + bytes([((6 - 4) << 2) | 1]))  # 0 of 1


# ---------------------------------------------------------------------------
# 2. Reference-parity import
# ---------------------------------------------------------------------------

def test_import_derives_hparams(ref_ckpt):
    prefix = ref_ckpt[0]
    params, derived = import_wavenet(prefix)
    assert derived == {
        "filter_width": 2, "residual_channels": 8, "dilation_channels": 8,
        "skip_channels": 16, "quantization_channels": 32, "use_biases": True,
        "scalar_input": False, "gc_channels": 4,
        "gc_category_cardinality": 3, "lc_channels": 0, "n_layers": 6,
    }
    assert len(params["layers"]) == 6
    assert params["layers"][0]["skip_bias"].shape == (16,)
    check_dilations(6, 3, 2)
    with pytest.raises(ImportError_, match="cannot be recovered"):
        check_dilations(6, 4, 2)


def test_imported_logits_match_reference_session(ref_ckpt):
    """THE parity assertion: same weights, reference TF graph vs our JAX
    network, logits equal to float32 tolerance."""
    import jax.numpy as jnp
    from types import SimpleNamespace
    from nspeech_tpu.models.wavenet import WaveNet

    prefix, codes, gc_ids, ref_logits = ref_ckpt
    params, derived = import_wavenet(prefix)
    cfg = SimpleNamespace(
        dilations_length=3, dilations_depth=2, initial_filter_width=32,
        **{k: v for k, v in derived.items() if k != "n_layers"})
    net = WaveNet(cfg)

    onehot = np.eye(derived["quantization_channels"],
                    dtype=np.float32)[codes]
    gc = net._embed_gc(params, jnp.asarray(gc_ids))
    mine = np.asarray(net._network(params, jnp.asarray(onehot), gc, None))
    assert mine.shape == ref_logits.shape
    np.testing.assert_allclose(mine, ref_logits, atol=2e-6, rtol=1e-5)


# ---------------------------------------------------------------------------
# 3. Mapper unit behavior (no TF needed — dict input)
# ---------------------------------------------------------------------------

def _synthetic_ref_tensors(rng, n_layers=2, gc_ch=0, lc_ch=0, biases=False):
    R, DC, S, Q, fw = 4, 4, 6, 16, 2
    t = {"wavenet/causal_layer/filter": rng.standard_normal((fw, Q, R))}
    for i in range(n_layers):
        base = f"wavenet/dilated_stack/layer{i}/"
        t[base + "filter"] = rng.standard_normal((fw, R, DC))
        t[base + "gate"] = rng.standard_normal((fw, R, DC))
        t[base + "dense"] = rng.standard_normal((1, DC, R))
        t[base + "skip"] = rng.standard_normal((1, DC, S))
        # The reference creates gc/lc weights even at 0 channels (its
        # `is not None` guards pass for 0 — wavenet.py:201-219).
        t[base + "gc_filter"] = np.zeros((1, gc_ch, DC))
        t[base + "gc_gate"] = np.zeros((1, gc_ch, DC))
        if lc_ch:
            t[base + "lc_filter"] = rng.standard_normal((1, lc_ch, DC))
            t[base + "lc_gate"] = rng.standard_normal((1, lc_ch, DC))
        if biases:
            for j, shape in enumerate([(DC,), (DC,), (R,), (S,)]):
                suffix = "Variable" if j == 0 else f"Variable_{j}"
                t[base + suffix] = rng.standard_normal(shape)
    t["wavenet/embeddings/gc_embedding"] = (
        rng.standard_normal((3, gc_ch)) if gc_ch
        else np.zeros((0, 0)))
    t["wavenet/postprocessing/postprocess1"] = rng.standard_normal((1, S, S))
    t["wavenet/postprocessing/postprocess2"] = rng.standard_normal((1, S, Q))
    if biases:
        t["wavenet/postprocessing/Variable"] = rng.standard_normal((S,))
        t["wavenet/postprocessing/Variable_1"] = rng.standard_normal((Q,))
    return t


@pytest.mark.smoke
def test_import_skips_stock_zero_sized_gc(rng):
    """Stock wavenet.yaml (gc_channels: 0) checkpoints carry 0-sized gc
    variables; the import must drop them and report an unconditioned
    model."""
    params, derived = import_wavenet(_synthetic_ref_tensors(rng))
    assert "gc_embedding" not in params
    assert "gc_filter" not in params["layers"][0]
    assert derived["gc_channels"] == 0
    assert derived["gc_category_cardinality"] == 0
    assert derived["use_biases"] is False


@pytest.mark.smoke
def test_import_maps_lc_and_optimizer_slots_ignored(rng):
    t = _synthetic_ref_tensors(rng, lc_ch=5, biases=True)
    # Adam slots from the reference optimizer must not break the import.
    t["wavenet/causal_layer/filter/Adam"] = np.zeros((2, 16, 4))
    t["wavenet/causal_layer/filter/Adam_1"] = np.zeros((2, 16, 4))
    t["beta1_power"] = np.zeros(())
    params, derived = import_wavenet(t)
    assert derived["lc_channels"] == 5
    assert derived["use_biases"] is True
    assert params["layers"][1]["lc_gate"].shape == (1, 5, 4)
    assert params["post2_bias"].shape == (16,)


@pytest.mark.smoke
def test_import_rejects_non_wavenet(rng):
    with pytest.raises(ImportError_, match="not a reference"):
        import_wavenet({"model/w": np.zeros((3, 3))})
    t = _synthetic_ref_tensors(rng)
    del t["wavenet/dilated_stack/layer1/gate"]
    with pytest.raises(ImportError_, match="layer 1 missing"):
        import_wavenet(t)
    t2 = _synthetic_ref_tensors(rng)
    t2["wavenet/dilated_stack/layer0/mystery"] = np.zeros((1,))
    with pytest.raises(ImportError_, match="unrecognized"):
        import_wavenet(t2)


# ---------------------------------------------------------------------------
# 4. CLI end-to-end: TF checkpoint -> servable run dir
# ---------------------------------------------------------------------------

def test_cli_roundtrip_serves_imported_weights(ref_ckpt, tmp_path):
    import jax.numpy as jnp
    import import_reference_ckpt
    from nspeech_tpu.models.wavenet import WaveNet
    from nspeech_tpu.train import config_from_checkpoint, load_serving_params

    prefix, codes, gc_ids, ref_logits = ref_ckpt
    out = str(tmp_path / "imported")
    rc = import_reference_ckpt.main([
        "--ckpt", prefix, "--out", out,
        "--dilations-length", "3", "--dilations-depth", "2"])
    assert rc == 0

    ckpt_dir = f"{out}/ckpt"
    cfg, model_name = config_from_checkpoint(ckpt_dir)
    assert model_name == "wavenet"
    assert int(cfg.quantization_channels) == 32
    assert int(cfg.num_speakers) == 3
    net = WaveNet(cfg)
    params, _ = load_serving_params(ckpt_dir, net, cfg, "wavenet")

    onehot = np.eye(32, dtype=np.float32)[codes]
    gc = net._embed_gc(params, jnp.asarray(gc_ids))
    mine = np.asarray(net._network(params, jnp.asarray(onehot), gc, None))
    np.testing.assert_allclose(mine, ref_logits, atol=2e-6, rtol=1e-5)
