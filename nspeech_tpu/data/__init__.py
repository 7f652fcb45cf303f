"""Data pipeline: corpus loaders, featurization, batch feeders."""

from nspeech_tpu.data.corpus import LOADERS, build_speaker_map, load_items  # noqa: F401
from nspeech_tpu.data.features import Utterance, build_from_paths, process_utterance  # noqa: F401
from nspeech_tpu.data.feeder import Batch, DataFeeder, pad_inputs, pad_targets, round_up  # noqa: F401
from nspeech_tpu.data.wavenet_feeder import WaveNetBatch, WaveNetFeeder, upsample_frames  # noqa: F401
