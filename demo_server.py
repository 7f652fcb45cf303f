#!/usr/bin/env python
"""Demo HTTP server: browser UI + GET /synthesize?text=...&speaker_id=N.

Same route contract as the reference (reference: demo_server.py) on stdlib
WSGI (no falcon dependency), with the reference's two defects fixed
(SURVEY.md §2.1): the synthesizer is constructed with explicit hparams, and
/synthesize returns actual encoded audio/wav bytes.
"""

from __future__ import annotations

import argparse
from urllib.parse import parse_qs

import nspeech_tpu.config as config
from nspeech_tpu.dsp import encode_wav_bytes
from nspeech_tpu.serving import Synthesizer

HTML_BODY = b"""<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>nspeech-tpu</title>
<style>
  :root { --bg: #12151a; --card: #1c2128; --ink: #d6dde6; --dim: #78828e;
          --accent: #4fb07a; --err: #d97066; }
  * { box-sizing: border-box; margin: 0; }
  body { background: var(--bg); color: var(--ink); min-height: 100vh;
         display: grid; place-items: center;
         font: 15px/1.5 ui-monospace, "SF Mono", Menlo, monospace; }
  main { background: var(--card); border-radius: 10px; padding: 2rem;
         width: min(34rem, 92vw); }
  h1 { font-size: 1.05rem; font-weight: 600; letter-spacing: .06em;
       text-transform: uppercase; color: var(--accent); }
  h1 small { color: var(--dim); font-weight: 400; text-transform: none;
             letter-spacing: 0; margin-left: .5rem; }
  textarea { width: 100%; margin-top: 1.2rem; resize: vertical;
             background: var(--bg); color: var(--ink); border: 1px solid #2c333c;
             border-radius: 6px; padding: .7rem; font: inherit; min-height: 4.5rem; }
  textarea:focus { border-color: var(--accent); outline: none; }
  .row { display: flex; gap: .8rem; align-items: center; margin-top: .9rem; }
  label { color: var(--dim); font-size: .85rem; }
  #spk { width: 4.5rem; background: var(--bg); color: var(--ink);
         border: 1px solid #2c333c; border-radius: 6px; padding: .35rem .5rem;
         font: inherit; }
  #go { margin-left: auto; background: var(--accent); color: #0b0e11;
        border: 0; border-radius: 6px; padding: .55rem 1.4rem; font: inherit;
        font-weight: 600; cursor: pointer; }
  #go:disabled { filter: grayscale(1); opacity: .5; cursor: wait; }
  #status { margin-top: 1rem; min-height: 1.4rem; color: var(--dim); }
  #status.error { color: var(--err); }
  audio { width: 100%; margin-top: .6rem; display: none; }
  audio.ready { display: block; }
</style>
</head>
<body>
<main>
  <h1>nspeech-tpu<small>text &rarr; speech</small></h1>
  <textarea id="utt" placeholder="Type a sentence to synthesize&hellip;"
            autofocus></textarea>
  <div class="row">
    <label for="spk">speaker</label>
    <input id="spk" type="number" value="-1" min="-1">
    <label><input id="live" type="checkbox"> stream</label>
    <button id="go">Synthesize</button>
  </div>
  <div id="status"></div>
  <audio id="player" controls></audio>
</main>
<script>
  const el = id => document.getElementById(id);

  async function speak() {
    const text = el('utt').value.trim();
    if (!text) { return; }
    const route = el('live').checked ? '/synthesize_stream' : '/synthesize';
    const url = route + '?text=' + encodeURIComponent(text) +
                '&speaker_id=' + encodeURIComponent(el('spk').value || '-1');
    el('go').disabled = true;
    el('status').className = '';
    el('status').textContent = 'synthesizing\\u2026';
    el('player').className = '';
    const t0 = performance.now();
    try {
      if (el('live').checked) {
        // progressive playback: the browser starts as chunks arrive
        // (needs the server started with --vocoder-checkpoint)
        el('player').src = url + '&t=' + Date.now();
        el('player').className = 'ready';
        await el('player').play();
        const dt = ((performance.now() - t0) / 1000).toFixed(2);
        el('status').textContent = 'first audio in ' + dt + ' s (streaming)';
      } else {
        const res = await fetch(url);
        if (!res.ok) { throw new Error(await res.text() || res.statusText); }
        el('player').src = URL.createObjectURL(await res.blob());
        el('player').className = 'ready';
        el('player').play();
        const dt = ((performance.now() - t0) / 1000).toFixed(2);
        el('status').textContent = 'done in ' + dt + ' s';
      }
    } catch (err) {
      el('status').className = 'error';
      el('status').textContent = String(err.message || err);
    } finally {
      el('go').disabled = false;
    }
  }

  el('go').addEventListener('click', speak);
  el('utt').addEventListener('keydown', ev => {
    if (ev.key === 'Enter' && !ev.shiftKey) { ev.preventDefault(); speak(); }
  });
</script>
</body>
</html>
"""


def make_app(synthesizer, cfg, streamer=None):
    """``synthesizer`` is anything with .synthesize(text, speaker_id) ->
    (wav, mel, lin) — a Synthesizer or a TextToSpeech pipeline."""

    import time as _time

    counters = {"started": _time.time(), "routes": {}}
    # Count only known routes by name and bucket everything else: keying on
    # raw request paths would let a URL scanner grow the dict without bound
    # (and the server is ThreadingMixIn — a fixed key set keeps the
    # per-key increment races benign).
    known_routes = frozenset(
        ("/", "/stats", "/synthesize_stream", "/synthesize",
         "/synthesize_batch"))

    def app(environ, start_response):
        path = environ.get("PATH_INFO", "/")
        route_key = path if path in known_routes else "other"
        counters["routes"][route_key] = counters["routes"].get(route_key, 0) + 1
        if path == "/":
            start_response("200 OK", [("Content-Type", "text/html")])
            return [HTML_BODY]
        if path == "/stats":
            import json as _json

            payload = {"uptime_sec": round(_time.time() - counters["started"], 1),
                       "routes": counters["routes"]}
            if hasattr(synthesizer, "stats"):  # DynamicBatcher
                payload["dynamic_batching"] = dict(synthesizer.stats)
            if streamer is not None and hasattr(streamer, "stats"):
                payload["stream_batching"] = dict(streamer.stats)
            body = _json.dumps(payload).encode("utf-8")
            start_response("200 OK", [("Content-Type", "application/json"),
                                      ("Content-Length", str(len(body)))])
            return [body]
        if path == "/synthesize_stream":
            if streamer is None:
                start_response("404 Not Found",
                               [("Content-Type", "text/plain")])
                return [b"streaming needs a WaveNet vocoder "
                        b"(--vocoder-checkpoint)"]
            params = parse_qs(environ.get("QUERY_STRING", ""))
            text = (params.get("text") or [""])[0]
            if not text:
                start_response("400 Bad Request",
                               [("Content-Type", "text/plain")])
                return [b"missing ?text="]
            try:
                speaker_id = int((params.get("speaker_id") or ["-1"])[0])
            except ValueError:
                start_response("400 Bad Request",
                               [("Content-Type", "text/plain")])
                return [b"speaker_id must be an integer"]
            from nspeech_tpu.dsp import encode_pcm16, wav_stream_header
            from nspeech_tpu.serving import ClientError

            # Build (and start) the stream BEFORE committing to 200 so
            # input rejections still map to 400 — once the header is
            # out, errors can only truncate the body.
            try:
                chunks = streamer.stream(text, speaker_id)
                first = next(chunks, None)
            except ClientError as e:
                start_response("400 Bad Request",
                               [("Content-Type", "text/plain")])
                return [str(e).encode("utf-8")]
            # No Content-Length: chunks leave as the device produces
            # them (the point of streaming); the header advertises
            # unknown WAV sizes.
            start_response("200 OK", [("Content-Type", "audio/wav")])

            def body():
                yield wav_stream_header(cfg.sample_rate)
                if first is None:
                    return
                yield encode_pcm16(first)
                try:
                    for chunk in chunks:
                        yield encode_pcm16(chunk)
                except Exception as e:  # mid-stream device fault: the
                    # 200 is already on the wire; log and truncate
                    print("synthesize_stream aborted mid-body: %s" % e)

            return body()
        if path == "/synthesize":
            params = parse_qs(environ.get("QUERY_STRING", ""))
            text = (params.get("text") or [""])[0]
            if not text:
                start_response("400 Bad Request",
                               [("Content-Type", "text/plain")])
                return [b"missing ?text="]
            try:
                speaker_id = int((params.get("speaker_id") or ["-1"])[0])
            except ValueError:
                start_response("400 Bad Request",
                               [("Content-Type", "text/plain")])
                return [b"speaker_id must be an integer"]
            from nspeech_tpu.serving import ClientError

            try:
                try:
                    # this route ships the wav only: skip the mel/linear
                    # device->host pulls (Synthesizer supports it; other
                    # backends — TextToSpeech, batcher, AOT — don't yet)
                    wav, _mel, _lin = synthesizer.synthesize(
                        text, speaker_id, want_features=False)
                except TypeError:
                    wav, _mel, _lin = synthesizer.synthesize(text, speaker_id)
            except ClientError as e:  # e.g. text beyond an AOT artifact's
                start_response("400 Bad Request",  # exported text_len
                               [("Content-Type", "text/plain")])
                return [str(e).encode("utf-8")]
            body = encode_wav_bytes(wav, cfg.sample_rate)
            start_response("200 OK", [("Content-Type", "audio/wav"),
                                      ("Content-Length", str(len(body)))])
            return [body]
        if path == "/synthesize_batch":
            # POST JSON {"texts": [...], "speaker_ids": [...]} -> zip of wavs.
            # One padded forward serves the whole batch when the synthesizer
            # exposes synthesize_batch.
            import io
            import json
            import zipfile

            try:
                size = int(environ.get("CONTENT_LENGTH") or 0)
                payload = json.loads(
                    environ["wsgi.input"].read(size).decode("utf-8"))
                texts = payload["texts"]
                speaker_ids = payload.get("speaker_ids")
            except Exception:
                start_response("400 Bad Request",
                               [("Content-Type", "text/plain")])
                return [b'POST JSON {"texts": [...]} required']
            if (not isinstance(texts, list) or not texts
                    or not all(isinstance(t, str) and t for t in texts)):
                start_response("400 Bad Request",
                               [("Content-Type", "text/plain")])
                return [b"texts must be a non-empty list of non-empty strings"]
            if speaker_ids is not None and (
                    not isinstance(speaker_ids, list)
                    or len(speaker_ids) != len(texts)
                    or not all(isinstance(s, int) and not isinstance(s, bool)
                               for s in speaker_ids)):
                start_response("400 Bad Request",
                               [("Content-Type", "text/plain")])
                return [b"speaker_ids must be a list of integers "
                        b"matching texts in length"]
            from nspeech_tpu.serving import ClientError

            try:
                if hasattr(synthesizer, "synthesize_batch"):
                    wavs, _, _ = synthesizer.synthesize_batch(
                        texts, speaker_ids)
                else:
                    wavs = [synthesizer.synthesize(
                        t, (speaker_ids or [-1] * len(texts))[i])[0]
                        for i, t in enumerate(texts)]
            except ClientError as e:
                # ONLY input-rejection errors (e.g. mixing explicit
                # speaker_ids with -1/None in one vocoder batch) map to
                # 400; anything else stays a genuine server fault.
                start_response("400 Bad Request",
                               [("Content-Type", "text/plain")])
                return [str(e).encode("utf-8")]
            buf = io.BytesIO()
            with zipfile.ZipFile(buf, "w") as z:
                for i, wav in enumerate(wavs):
                    z.writestr("utt_%03d.wav" % i,
                               encode_wav_bytes(wav, cfg.sample_rate))
            body = buf.getvalue()
            start_response("200 OK", [("Content-Type", "application/zip"),
                                      ("Content-Length", str(len(body)))])
            return [body]
        start_response("404 Not Found", [("Content-Type", "text/plain")])
        return [b"not found"]

    return app


def serve_forever(app, port: int) -> None:
    """Threaded WSGI server: concurrent requests overlap (a long stream
    must not block /synthesize), which is also what lets the dynamic
    batcher see more than one request per window."""
    from socketserver import ThreadingMixIn
    from wsgiref import simple_server

    class _Server(ThreadingMixIn, simple_server.WSGIServer):
        daemon_threads = True

    simple_server.make_server("0.0.0.0", port, app,
                              server_class=_Server).serve_forever()


def _maybe_batch(synthesizer, args):
    if args.dynamic_batch > 0:
        from nspeech_tpu.serving import DynamicBatcher

        print("Dynamic batching: up to %d requests per %.0f ms window"
              % (args.dynamic_batch, args.batch_window_ms))
        return DynamicBatcher(synthesizer, max_batch=args.dynamic_batch,
                              window_ms=args.batch_window_ms)
    return synthesizer


def _warmup(synthesizer, streamer, args) -> None:
    """Compile every program a first request could hit: the wav-only and
    full-feature single paths, the max dynamic-batch bucket, and (with
    streaming) the 1- and max-size stream batches."""
    import time as _t

    text = "warm up the serving programs."
    t0 = _t.monotonic()
    print("Warmup: single synthesize ...", flush=True)
    try:
        synthesizer.synthesize(text, -1, want_features=False)
        synthesizer.synthesize(text, -1)
    except TypeError:
        synthesizer.synthesize(text, -1)
    if args.dynamic_batch > 1 and hasattr(synthesizer, "synthesize_batch"):
        print("Warmup: batch-%d synthesize ..." % args.dynamic_batch,
              flush=True)
        synthesizer.synthesize_batch([text] * args.dynamic_batch)
    if streamer is not None:
        tts = getattr(streamer, "_tts", streamer)   # unwrap StreamBatcher
        print("Warmup: single stream ...", flush=True)
        for _ in tts.stream(text):
            pass
        if args.dynamic_batch > 1:
            print("Warmup: batch-%d stream ..." % args.dynamic_batch,
                  flush=True)
            for _ in tts.stream_batch([text] * args.dynamic_batch):
                pass
    print("Warmup done in %.0f s" % (_t.monotonic() - t0), flush=True)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", default=None,
                        help="Checkpoint directory (log_dir/<run>/ckpt)")
    parser.add_argument("--artifact", default=None,
                        help="AOT serving artifact from export_serving.py "
                             "(serves with no model code or checkpoint; "
                             "mutually exclusive with --checkpoint)")
    parser.add_argument("--checkpoint-step", type=int, default=None)
    parser.add_argument("--port", type=int, default=9000)
    parser.add_argument("--model", default=None, help="Model name (default: checkpoint run metadata)")
    parser.add_argument("--hparams", default="")
    parser.add_argument("--num-speakers", type=int, default=None)
    parser.add_argument("--vocoder-checkpoint", default=None,
                        help="WaveNet vocoder checkpoint dir (else Griffin-Lim)")
    parser.add_argument("--vocoder-model", default=None)
    parser.add_argument("--vocoder-hparams", default="")
    parser.add_argument("--stream-chunk-frames", type=int, default=40,
                        help="Mel frames per /synthesize_stream chunk "
                             "(0.5 s at the default 12.5 ms frame shift)")
    parser.add_argument("--dynamic-batch", type=int, default=0, metavar="N",
                        help="Batch concurrent /synthesize requests (up to "
                             "N) into one device program; 0 = off")
    parser.add_argument("--batch-window-ms", type=float, default=10.0,
                        help="How long the dynamic batcher waits for "
                             "companions after the first request")
    parser.add_argument("--warmup", action="store_true",
                        help="Compile the serving programs at startup "
                             "(one dummy request per surface and batch "
                             "bucket) so first real requests don't pay "
                             "multi-minute XLA compiles")
    parser.add_argument("--platform", default=None)
    parser.add_argument("--data-parallel", action="store_true",
                        help="Shard batched synthesis over all local "
                        "devices (jax.sharding data mesh); pairs well "
                        "with --dynamic-batch")
    args = parser.parse_args()
    from nspeech_tpu.utils.platform import set_platform

    set_platform(args.platform)
    if bool(args.checkpoint) == bool(args.artifact):
        parser.error("exactly one of --checkpoint / --artifact is required")
    if args.artifact:
        if args.vocoder_checkpoint:
            parser.error("--artifact serves the exported Griffin-Lim "
                         "program; --vocoder-checkpoint needs --checkpoint")
        from types import SimpleNamespace

        from nspeech_tpu.serving import ExportedSynthesizer

        synthesizer = ExportedSynthesizer(args.artifact)
        cfg = SimpleNamespace(sample_rate=synthesizer.meta["sample_rate"])
        app = make_app(_maybe_batch(synthesizer, args), cfg)
        print("Serving AOT artifact %s on port %d" % (args.artifact, args.port))
        serve_forever(app, args.port)
        return
    overrides = args.hparams
    if args.num_speakers is not None:
        overrides = (overrides + "," if overrides else "") \
            + "num_speakers=%d" % args.num_speakers
    mesh = None
    if args.data_parallel:
        import jax

        from nspeech_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(jax.devices())
        print("Serving data-parallel over %d devices" % len(jax.devices()))
    synthesizer = Synthesizer.from_checkpoint(
        args.checkpoint, args.model, overrides, step=args.checkpoint_step,
        mesh=mesh)
    cfg = synthesizer.cfg
    print(config.debug_string(cfg))
    streamer = None
    if args.vocoder_checkpoint:
        from nspeech_tpu.serving import (
            StreamingTTS,
            TextToSpeech,
            WaveNetVocoder,
        )

        vocoder = WaveNetVocoder.from_checkpoint(
            args.vocoder_checkpoint, args.vocoder_model,
            args.vocoder_hparams)
        if vocoder.net.lc_channels > 0:
            # GET /synthesize_stream: chunked audio while decoding
            streamer = StreamingTTS(synthesizer, vocoder,
                                    chunk_frames=args.stream_chunk_frames)
            if args.dynamic_batch > 0:
                from nspeech_tpu.serving import StreamBatcher

                print("Stream batching: up to %d concurrent streams per "
                      "%.0f ms window" % (args.dynamic_batch,
                                          args.batch_window_ms))
                streamer = StreamBatcher(streamer,
                                         max_batch=args.dynamic_batch,
                                         window_ms=args.batch_window_ms)
        synthesizer = TextToSpeech(synthesizer, vocoder)
    synthesizer = _maybe_batch(synthesizer, args)
    if args.warmup:
        _warmup(synthesizer, streamer, args)
    app = make_app(synthesizer, cfg, streamer=streamer)
    print("Serving on port %d" % args.port)
    serve_forever(app, args.port)


if __name__ == "__main__":
    main()
