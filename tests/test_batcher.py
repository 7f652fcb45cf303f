"""Dynamic request batching (serving/batcher.py)."""

import threading
import time

import numpy as np
import pytest

from nspeech_tpu.serving import DynamicBatcher


class FakeSynth:
    """Deterministic per-text results + a batch-size log. A small sleep
    models device time so concurrent requests pile into one window."""

    def __init__(self, delay=0.02, reject_mixed=False, bad_text=None):
        self.batch_sizes = []
        self.delay = delay
        self.reject_mixed = reject_mixed
        self.bad_text = bad_text
        self.lock = threading.Lock()

    def synthesize_batch(self, texts, speaker_ids=None):
        with self.lock:
            self.batch_sizes.append(len(texts))
        if self.reject_mixed and speaker_ids is not None:
            neg = [s for s in speaker_ids if s is None or s < 0]
            if neg and len(neg) != len(speaker_ids):
                raise ValueError("mixed default/explicit conditioning")
        if self.bad_text is not None and self.bad_text in texts:
            raise ValueError("bad text")
        time.sleep(self.delay)
        wavs = [np.full(4, float(len(t)), np.float32) for t in texts]
        mels = np.stack([np.full((3, 2), float(len(t))) for t in texts])
        return wavs, mels, mels


def _fire(batcher, texts, speakers=None):
    results = {}
    errors = {}

    def one(i, t, s):
        try:
            results[i] = batcher.synthesize(t, s, timeout=10)
        except Exception as e:  # noqa: BLE001 - recorded for assertions
            errors[i] = e

    speakers = speakers or [-1] * len(texts)
    threads = [threading.Thread(target=one, args=(i, t, s))
               for i, (t, s) in enumerate(zip(texts, speakers))]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    return results, errors


def test_concurrent_requests_batch_and_fan_out():
    fake = FakeSynth()
    b = DynamicBatcher(fake, max_batch=8, window_ms=50)
    texts = ["a" * (i + 1) for i in range(10)]
    results, errors = _fire(b, texts)
    b.close()
    assert not errors and len(results) == 10
    for i, t in enumerate(texts):
        wav, mel, _lin = results[i]
        assert wav[0] == len(t) and mel[0, 0] == len(t)  # right answer to
        # the right caller, not just any batch member's
    assert b.stats["requests"] == 10
    assert b.stats["batches"] < 10  # it actually batched
    assert max(fake.batch_sizes) > 1


def test_mixed_speaker_conditioning_partitioned():
    fake = FakeSynth(reject_mixed=True)
    b = DynamicBatcher(fake, max_batch=8, window_ms=50)
    results, errors = _fire(b, ["aa", "bbb", "cccc", "ddddd"],
                            [-1, 2, -1, 3])
    b.close()
    assert not errors and len(results) == 4
    assert results[1][0][0] == 3 and results[3][0][0] == 5


def test_one_bad_request_does_not_poison_the_window():
    fake = FakeSynth(bad_text="BAD")
    b = DynamicBatcher(fake, max_batch=8, window_ms=50)
    results, errors = _fire(b, ["ok", "BAD", "fine"])
    b.close()
    assert set(errors) == {1}
    assert isinstance(errors[1], ValueError)
    assert results[0][0][0] == 2 and results[2][0][0] == 4


def test_single_request_passthrough_and_batch_forward():
    fake = FakeSynth(delay=0.0)
    b = DynamicBatcher(fake, max_batch=4, window_ms=1)
    wav, _mel, _lin = b.synthesize("hello", -1)
    assert wav[0] == 5
    wavs, _m, _l = b.synthesize_batch(["xx", "yyy"])
    assert wavs[0][0] == 2 and wavs[1][0] == 3
    b.close()
    assert b.stats["requests"] == 1  # client batches bypass the window


def test_rejects_batchless_synthesizer():
    with pytest.raises(ValueError, match="synthesize_batch"):
        DynamicBatcher(object())


def test_wsgi_route_through_batcher():
    """make_app's /synthesize works unchanged through the batcher."""
    from types import SimpleNamespace

    from demo_server import make_app

    fake = FakeSynth(delay=0.0)
    b = DynamicBatcher(fake, max_batch=4, window_ms=1)
    app = make_app(b, SimpleNamespace(sample_rate=16000))
    captured = {}

    def start_response(status, headers):
        captured["status"] = status

    body = b"".join(app({"PATH_INFO": "/synthesize",
                         "QUERY_STRING": "text=hello"}, start_response))
    assert captured["status"] == "200 OK"
    assert body[:4] == b"RIFF"

    import json

    # unknown paths (e.g. a URL scanner) share one bounded bucket instead
    # of growing the counter dict per distinct path
    for junk in ("/admin.php", "/wp-login", "/.env"):
        b"".join(app({"PATH_INFO": junk, "QUERY_STRING": ""},
                     start_response))

    body = b"".join(app({"PATH_INFO": "/stats", "QUERY_STRING": ""},
                        start_response))
    b.close()
    stats = json.loads(body)
    assert stats["routes"]["/synthesize"] == 1
    assert stats["routes"]["other"] == 3
    assert "/admin.php" not in stats["routes"]
    assert stats["dynamic_batching"]["requests"] == 1


def test_retry_does_not_double_count_stats():
    """A failed batch re-runs each window-mate alone; those retries must
    not inflate the /stats batching-efficiency counters."""
    fake = FakeSynth(bad_text="BAD")
    b = DynamicBatcher(fake, max_batch=8, window_ms=50)
    results, errors = _fire(b, ["ok", "BAD", "fine"])
    b.close()
    assert set(errors) == {1} and len(results) == 2
    assert b.stats["requests"] == 3  # not 3 + per-item retries


def test_dead_worker_fails_loudly():
    fake = FakeSynth(delay=0.0)
    b = DynamicBatcher(fake, max_batch=2, window_ms=1)
    b.close()  # worker exits
    with pytest.raises(RuntimeError, match="worker thread is dead"):
        b.synthesize("hello", -1)


class FakeStreamer:
    """stream_batch stub: K chunks per stream, per-text deterministic
    values, stream i ends after len(text)%3+1 chunks (None afterward)."""

    def __init__(self, delay=0.02, bad_text=None):
        self.batch_sizes = []
        self.delay = delay
        self.bad_text = bad_text
        self.lock = threading.Lock()

    def stream_batch(self, texts, speaker_ids=None):
        with self.lock:
            self.batch_sizes.append(len(texts))
        if self.bad_text is not None and self.bad_text in texts:
            raise ValueError("bad text")
        ends = [len(t) % 3 + 1 for t in texts]
        for rnd in range(max(ends)):
            time.sleep(self.delay)
            yield [np.full(4, float(len(t) * 10 + rnd), np.float32)
                   if rnd < ends[i] else None
                   for i, t in enumerate(texts)]


def _fire_streams(batcher, texts, speakers=None):
    results = {}
    errors = {}

    def one(i, t, s):
        try:
            results[i] = list(batcher.stream(t, s, timeout=10))
        except Exception as e:  # noqa: BLE001 - recorded for assertions
            errors[i] = e

    speakers = speakers or [-1] * len(texts)
    threads = [threading.Thread(target=one, args=(i, t, s))
               for i, (t, s) in enumerate(zip(texts, speakers))]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    return results, errors


def test_stream_batcher_groups_and_fans_out():
    from nspeech_tpu.serving import StreamBatcher

    fake = FakeStreamer()
    b = StreamBatcher(fake, max_batch=4, window_ms=100.0)
    texts = ["ab", "defg", "hijkl"]          # ends after 3, 2, 1 chunks
    results, errors = _fire_streams(b, texts)
    assert not errors
    assert max(fake.batch_sizes) >= 2        # actually grouped
    for i, t in enumerate(texts):
        chunks = results[i]
        assert len(chunks) == len(t) % 3 + 1
        for rnd, c in enumerate(chunks):
            np.testing.assert_array_equal(
                c, np.full(4, float(len(t) * 10 + rnd), np.float32))
    assert b.stats["requests"] == 3
    assert b.stats["batches"] <= 2


def test_stream_batcher_failure_aborts_group():
    from nspeech_tpu.serving import StreamBatcher

    fake = FakeStreamer(bad_text="bad")
    b = StreamBatcher(fake, max_batch=4, window_ms=100.0)
    results, errors = _fire_streams(b, ["ok text", "bad"])
    # the whole group fails (partial audio cannot be retried per item)
    assert set(errors) == {0, 1}
    assert all(isinstance(e, ValueError) for e in errors.values())


def test_stream_batcher_rejects_streamless():
    from nspeech_tpu.serving import StreamBatcher

    with pytest.raises(ValueError, match="stream_batch"):
        StreamBatcher(object())


def test_server_warmup_touches_every_surface():
    """--warmup compiles each program a first request could hit: single
    (wav-only + full), the max batch bucket, and 1/max stream batches."""
    from types import SimpleNamespace

    from demo_server import _warmup

    calls = []

    class WarmSynth:
        def synthesize(self, text, speaker_id, want_features=True):
            calls.append(("synthesize", want_features))
            return np.zeros(4, np.float32), None, None

        def synthesize_batch(self, texts, speaker_ids=None):
            calls.append(("batch", len(texts)))
            wavs = [np.zeros(4, np.float32)] * len(texts)
            return wavs, None, None

    class WarmStreamer:
        def stream(self, text, speaker_id=-1):
            calls.append(("stream", 1))
            yield np.zeros(4, np.float32)

        def stream_batch(self, texts, speaker_ids=None):
            calls.append(("stream_batch", len(texts)))
            yield [np.zeros(4, np.float32)] * len(texts)

    args = SimpleNamespace(dynamic_batch=4)
    _warmup(WarmSynth(), WarmStreamer(), args)
    assert ("synthesize", False) in calls and ("synthesize", True) in calls
    assert ("batch", 4) in calls
    assert ("stream", 1) in calls and ("stream_batch", 4) in calls
