"""Data pipeline tests: corpus parsing, padding/bucketing math, feeder
determinism and shape stability, WaveNet windowing (SURVEY.md §4.1, §4.3)."""

import numpy as np
import pytest

from nspeech_tpu.config import load_config, stft_params
from nspeech_tpu.data import (
    DataFeeder,
    WaveNetFeeder,
    build_speaker_map,
    load_items,
    pad_inputs,
    pad_targets,
    process_utterance,
    round_up,
    upsample_frames,
)
from tests.make_synth_corpus import make_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("corpus")
    return str(make_corpus(str(out), n=6))


@pytest.fixture(scope="module")
def cfg():
    c = load_config("taco1")
    c.parse("batch_size=2,batch_group_size=2")
    return c


def test_round_up():
    assert round_up(10, 5) == 10
    assert round_up(11, 5) == 15
    assert round_up(1, 5) == 5


def test_pad_inputs_and_targets():
    seqs = [np.arange(1, 4, dtype=np.int32), np.arange(1, 8, dtype=np.int32)]
    padded = pad_inputs(seqs)
    assert padded.shape == (2, 7)
    assert padded[0, 3:].tolist() == [0, 0, 0, 0]
    targets = [np.ones((9, 3), np.float32), np.ones((4, 3), np.float32)]
    pt = pad_targets(targets, r=5)
    # max_len 9 + 1 = 10 -> multiple of 5 stays 10
    assert pt.shape == (2, 10, 3)
    assert pt[1, 4:].sum() == 0


def test_load_items_and_speaker_map(corpus):
    items = load_items({"ljspeech": corpus})
    assert len(items) == 6
    wav_path, text, spk, ds = items[0]
    assert wav_path.endswith(".wav") and ds == "ljspeech" and spk == 0
    smap = build_speaker_map(items)
    assert smap == {("ljspeech", "0"): 0}


def test_process_utterance_cached(corpus, cfg, tmp_path):
    items = load_items({"ljspeech": corpus})
    cache = str(tmp_path / "cache")
    utt1 = process_utterance(items[0][0], cfg, cache)
    assert utt1.linear.shape[1] == 1025 and utt1.mel.shape[1] == 80
    assert utt1.linear.shape[0] == utt1.n_frames
    utt2 = process_utterance(items[0][0], cfg, cache)  # from cache
    np.testing.assert_array_equal(utt1.linear, utt2.linear)
    np.testing.assert_array_equal(utt1.wav, utt2.wav)


def test_feeder_shapes_and_determinism(corpus, cfg):
    feeder = DataFeeder({"ljspeech": corpus}, cfg, seed=3,
                        bucket_text=16, bucket_frames=20)
    b1 = list(feeder.epoch_batches(0))
    b2 = list(feeder.epoch_batches(0))
    assert len(b1) >= 1
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a.inputs, b.inputs)
        np.testing.assert_array_equal(a.mel_targets, b.mel_targets)
    batch = b1[0]
    B = cfg.batch_size
    assert batch.inputs.shape[0] == B
    assert batch.inputs.shape[1] % 16 == 0
    assert batch.mel_targets.shape == (B, batch.linear_targets.shape[1], 80)
    assert batch.linear_targets.shape[2] == 1025
    assert batch.mel_targets.shape[1] % cfg.outputs_per_step == 0
    assert batch.mel_targets.shape[1] % 20 == 0
    assert batch.input_lengths.max() <= batch.inputs.shape[1]
    # pad id is 0 beyond each length
    for i in range(B):
        assert np.all(batch.inputs[i, batch.input_lengths[i]:] == 0)


def test_feeder_epochs_differ(corpus, cfg):
    feeder = DataFeeder({"ljspeech": corpus}, cfg, seed=3)
    b0 = list(feeder.epoch_batches(0))
    b1 = list(feeder.epoch_batches(1))
    diff = any(
        a.inputs.shape != b.inputs.shape or not np.array_equal(a.inputs, b.inputs)
        for a, b in zip(b0, b1)
    )
    assert diff


def test_feeder_sharding(corpus, cfg):
    f0 = DataFeeder({"ljspeech": corpus}, cfg, shard_index=0, shard_count=2)
    f1 = DataFeeder({"ljspeech": corpus}, cfg, shard_index=1, shard_count=2)
    assert len(f0._items) + len(f1._items) == 6
    paths0 = {i[0] for i in f0._items}
    paths1 = {i[0] for i in f1._items}
    assert not paths0 & paths1


def test_feeder_prefetch_stream(corpus, cfg):
    feeder = DataFeeder({"ljspeech": corpus}, cfg)
    it = feeder.batches()
    batches = [next(it) for _ in range(4)]
    assert all(b.inputs.shape[0] == cfg.batch_size for b in batches)
    it.close()


def test_upsample_frames():
    frames = np.array([[0.0], [1.0], [2.0]], dtype=np.float32)
    up = upsample_frames(frames, hop_length=4, length=12)
    assert up.shape == (12, 1)
    np.testing.assert_allclose(up[0, 0], 0.0)
    np.testing.assert_allclose(up[4, 0], 1.0)
    np.testing.assert_allclose(up[2, 0], 0.5)
    np.testing.assert_allclose(up[8:, 0], 2.0)  # clamped past last anchor


def test_wavenet_feeder_windows(corpus):
    cfg = load_config("wavenet")
    cfg.parse("batch_size=3,sample_size=1000")
    receptive_field = 1026  # small synthetic RF for the test
    feeder = WaveNetFeeder({"ljspeech": corpus}, receptive_field, cfg,
                           frame_lc=False)  # legacy per-sample lc layout
    it = feeder.batches()
    b = next(it)
    W = receptive_field + 1000
    assert b.audio.shape == (3, W)
    assert b.mel.shape == (3, W, 80)
    assert b.mel_phase is None
    assert b.speaker_ids.shape == (3,)
    # Left padding: first window of each utterance starts with RF zeros.
    assert np.all(b.audio[0, :receptive_field] == 0)
    # Overlap contract: consecutive windows of one utterance overlap by RF.
    b2 = next(it)
    joined = np.concatenate([b.audio, b2.audio])
    found_overlap = False
    for i in range(len(joined) - 1):
        if np.array_equal(joined[i, 1000:], joined[i + 1, :receptive_field + 0][: W - 1000]):
            found_overlap = True
            break
    assert found_overlap


def test_build_from_paths_parallel_matches_serial(corpus, cfg, tmp_path):
    """N spawned workers fill the cache with byte-identical features
    (VERDICT r1 item 9: preprocess --num-workers)."""
    from nspeech_tpu.data.features import build_from_paths, _cache_path

    items = load_items({"ljspeech": corpus})
    paths = [p for p, _, _, _ in items[:3]]
    cache_s = str(tmp_path / "serial")
    cache_p = str(tmp_path / "parallel")
    serial = build_from_paths(paths, cfg, cache_s, num_workers=1)
    parallel = build_from_paths(paths, cfg, cache_p, num_workers=2)
    assert len(serial) == len(parallel) == 3
    for p, us, up in zip(paths, serial, parallel):
        np.testing.assert_array_equal(us.linear, up.linear)
        np.testing.assert_array_equal(us.mel, up.mel)
        with np.load(_cache_path(cache_s, p, cfg)) as a, \
                np.load(_cache_path(cache_p, p, cfg)) as b:
            np.testing.assert_array_equal(a["linear"], b["linear"])


def test_cache_key_tracks_file_identity(corpus, cfg, tmp_path):
    """Replacing a wav (new mtime/size) must invalidate its cache entry."""
    import os
    import shutil

    from nspeech_tpu.data.features import _cache_path

    items = load_items({"ljspeech": corpus})
    src = items[0][0]
    wav = str(tmp_path / "x.wav")
    shutil.copy(src, wav)
    k1 = _cache_path(str(tmp_path / "c"), wav, cfg)
    st = os.stat(wav)
    os.utime(wav, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    k2 = _cache_path(str(tmp_path / "c"), wav, cfg)
    assert k1 != k2


def test_feeder_tiny_corpus_wraps_to_fill_batch(corpus, cfg):
    """A shard smaller than batch_size wraps around instead of starving
    (the reference feeder cycles its cursor, datafeeder.py:160-176)."""
    big = load_config("taco1")
    big.parse("batch_size=16,batch_group_size=2")
    feeder = DataFeeder({"ljspeech": corpus}, big, seed=3)
    batch = next(iter(feeder.epoch_batches(0)))
    assert batch.inputs.shape[0] == 16
    b2 = next(feeder.batches())  # threaded path must not spin
    assert b2.inputs.shape[0] == 16


def test_device_cached_batches(tmp_path):
    """Device-resident batch cache: uniform shapes (one compile), fixed
    composition, epoch-shuffled order, endless stream."""
    import jax

    from nspeech_tpu.config import load_config
    from nspeech_tpu.data.device_cache import DeviceCachedBatches
    from nspeech_tpu.data.feeder import DataFeeder
    from tests.make_synth_corpus import make_corpus

    corpus = make_corpus(str(tmp_path / "corpus"), n=6)
    cfg = load_config("taco1")
    cfg.parse("batch_size=2,batch_group_size=2")
    feeder = DataFeeder({"ljspeech": corpus}, cfg,
                        cache_dir=str(tmp_path / "cache"))
    cache = DeviceCachedBatches(feeder, n_epoch_variants=2, seed=0)
    assert cache.n_batches >= 4
    it = cache.batches()
    seen = [next(it) for _ in range(2 * cache.n_batches + 1)]
    shapes = {tuple(b.mel_targets.shape) for b in seen}
    assert len(shapes) == 1  # uniform -> a single jit program
    assert all(isinstance(b.inputs, jax.Array) for b in seen)
    assert seen[0].audio.shape[1] == 8  # waveforms stubbed out of HBM


def test_frame_lc_matches_per_sample_lc(corpus):
    """The default frame-rate lc layout, upsampled ON DEVICE with the
    per-window phase, reproduces the legacy host per-sample layout
    exactly (same windows, same values)."""
    import jax.numpy as jnp

    from nspeech_tpu.config import stft_params
    from nspeech_tpu.ops.upsample import upsample_window

    cfg = load_config("wavenet")
    cfg.parse("batch_size=3,sample_size=1000")
    rf = 1026
    legacy = WaveNetFeeder({"ljspeech": corpus}, rf, cfg, frame_lc=False)
    framed = WaveNetFeeder({"ljspeech": corpus}, rf, cfg, frame_lc=True)
    _, hop, _ = stft_params(cfg)
    W = rf + 1000
    it_l, it_f = legacy.batches(), framed.batches()
    for _ in range(3):
        bl, bf = next(it_l), next(it_f)
        np.testing.assert_array_equal(bl.audio, bf.audio)
        assert bf.mel.shape[1] == framed.frames_per_window
        up = np.asarray(upsample_window(
            jnp.asarray(bf.mel), jnp.asarray(bf.mel_phase), hop, W))
        np.testing.assert_allclose(up, bl.mel, atol=2e-5)


def test_upsample_on_device_matches_host(rng):
    from nspeech_tpu.data.wavenet_feeder import upsample_frames
    from nspeech_tpu.ops.upsample import upsample_on_device

    frames = rng.random((2, 7, 3)).astype(np.float32)
    hop, length = 5, 40
    dev = np.asarray(upsample_on_device(frames, hop, length))
    for n in range(2):
        host = upsample_frames(frames[n], hop, length)
        np.testing.assert_allclose(dev[n], host, atol=1e-6)
