"""Serving: synthesizer and demo HTTP server."""

from nspeech_tpu.serving.synthesizer import Synthesizer  # noqa: F401
