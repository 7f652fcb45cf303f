"""Serving: synthesizer and demo HTTP server."""

from nspeech_tpu.serving.errors import ClientError  # noqa: F401
from nspeech_tpu.serving.pipeline import TextToSpeech, WaveNetVocoder  # noqa: F401
from nspeech_tpu.serving.synthesizer import Synthesizer  # noqa: F401
from nspeech_tpu.serving.export import (  # noqa: F401
    ExportedSynthesizer,
    ExportedVocoder,
    export_synthesizer,
    export_vocoder,
)
from nspeech_tpu.serving.streaming import StreamingTTS  # noqa: F401
from nspeech_tpu.serving.batcher import (  # noqa: F401
    DynamicBatcher,
    StreamBatcher,
)
from nspeech_tpu.serving.longform import split_text, synthesize_long  # noqa: F401
