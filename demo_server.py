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

HTML_BODY = b"""<html><title>nspeech-tpu demo</title>
<style>
body {padding: 16px; font-family: sans-serif; font-size: 14px; color: #444}
input {font-size: 14px; padding: 8px 12px; outline: none; border: 1px solid #ddd}
input:focus {box-shadow: 0 1px 2px rgba(0,0,0,.15)}
p {padding: 12px}
button {background: #28d; padding: 9px 14px; margin-left: 8px; border: none;
        outline: none; color: #fff; font-size: 14px; border-radius: 4px;
        cursor: pointer;}
button:hover {box-shadow: 0 1px 2px rgba(0,0,0,.15); opacity: 0.9;}
button[disabled] {opacity: 0.4; cursor: default}
</style>
<body>
<form>
  <input id="text" type="text" size="40" placeholder="Enter Text">
  <button id="button" name="synthesize">Speak</button>
</form>
<p id="message"></p>
<audio id="audio" controls autoplay hidden></audio>
<script>
function q(s) {return document.querySelector(s)}
q('#text').focus()
q('#button').addEventListener('click', function(e) {
  var text = q('#text').value.trim()
  if (text) {
    q('#message').textContent = 'Synthesizing...'
    q('#button').disabled = true
    q('#audio').hidden = true
    fetch('/synthesize?text=' + encodeURIComponent(text), {cache: 'no-cache'})
      .then(function(res) {
        if (!res.ok) throw Error(res.statusText)
        return res.blob()
      }).then(function(blob) {
        q('#message').textContent = ''
        q('#button').disabled = false
        q('#audio').src = URL.createObjectURL(blob)
        q('#audio').hidden = false
      }).catch(function(err) {
        q('#message').textContent = 'Error: ' + err.message
        q('#button').disabled = false
      })
  }
  e.preventDefault()
  return false
})
</script></body></html>
"""


def make_app(synthesizer, cfg):
    """``synthesizer`` is anything with .synthesize(text, speaker_id) ->
    (wav, mel, lin) — a Synthesizer or a TextToSpeech pipeline."""

    def app(environ, start_response):
        path = environ.get("PATH_INFO", "/")
        if path == "/":
            start_response("200 OK", [("Content-Type", "text/html")])
            return [HTML_BODY]
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
            wav, _mel, _lin = synthesizer.synthesize(text, speaker_id)
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
            if hasattr(synthesizer, "synthesize_batch"):
                wavs, _, _ = synthesizer.synthesize_batch(texts, speaker_ids)
            else:
                wavs = [synthesizer.synthesize(
                    t, (speaker_ids or [-1] * len(texts))[i])[0]
                    for i, t in enumerate(texts)]
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


def main() -> None:
    from wsgiref import simple_server

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True,
                        help="Checkpoint directory (log_dir/<run>/ckpt)")
    parser.add_argument("--checkpoint-step", type=int, default=None)
    parser.add_argument("--port", type=int, default=9000)
    parser.add_argument("--model", default="taco1")
    parser.add_argument("--hparams", default="")
    parser.add_argument("--num-speakers", type=int, default=None)
    parser.add_argument("--vocoder-checkpoint", default=None,
                        help="WaveNet vocoder checkpoint dir (else Griffin-Lim)")
    parser.add_argument("--vocoder-model", default="wavenet")
    parser.add_argument("--vocoder-hparams", default="")
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()
    from nspeech_tpu.utils.platform import set_platform

    set_platform(args.platform)
    cfg = config.load_config(args.model)
    cfg.parse(args.hparams)
    if args.num_speakers is not None:
        cfg.num_speakers = args.num_speakers
    print(config.debug_string(cfg))
    synthesizer = Synthesizer(cfg)
    synthesizer.load(args.checkpoint, args.model, step=args.checkpoint_step)
    if args.vocoder_checkpoint:
        from nspeech_tpu.serving import TextToSpeech, WaveNetVocoder

        vcfg = config.load_config(args.vocoder_model)
        vcfg.parse(args.vocoder_hparams)
        vocoder = WaveNetVocoder(vcfg).load(args.vocoder_checkpoint,
                                            args.vocoder_model)
        synthesizer = TextToSpeech(synthesizer, vocoder)
    app = make_app(synthesizer, cfg)
    print("Serving on port %d" % args.port)
    simple_server.make_server("0.0.0.0", args.port, app).serve_forever()


if __name__ == "__main__":
    main()
