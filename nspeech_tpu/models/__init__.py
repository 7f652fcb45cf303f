"""Model registry (reference: neural_speech/models/__init__.py:7-17).

``simple_wavenet`` maps to the same parameterized WaveNet class — the
reference's near-duplicate SimpleWaveNetModel is collapsed into one
implementation (SURVEY.md §2.2 note (a))."""

from nspeech_tpu.config import Config
from nspeech_tpu.models.tacotron import Tacotron1
from nspeech_tpu.models.tacotron2 import Tacotron2
from nspeech_tpu.models.wavenet import WaveNet

MODELS = {
    "taco1": Tacotron1,
    "taco2": Tacotron2,
    "wavenet": WaveNet,
    "simple_wavenet": WaveNet,
}


def create_model(name: str, cfg: Config):
    if name not in MODELS:
        raise ValueError(f"Unknown model: {name} (known: {sorted(MODELS)})")
    return MODELS[name](cfg)
