"""DSP layer: on-device feature extraction and inversion."""

from nspeech_tpu.dsp.audio import (  # noqa: F401
    amp_to_db,
    db_to_amp,
    denormalize,
    find_endpoint,
    inv_preemphasis,
    inv_spectrogram,
    istft,
    melspectrogram,
    normalize,
    preemphasis,
    spectrogram,
    spectrograms,
    stft,
)
from nspeech_tpu.dsp.mel import mel_filterbank  # noqa: F401
from nspeech_tpu.dsp.mulaw import mu_law_decode, mu_law_encode  # noqa: F401
from nspeech_tpu.dsp.trim import trim_silence, trim_wav  # noqa: F401
from nspeech_tpu.dsp.wavio import (  # noqa: F401
    encode_pcm16,
    encode_wav_bytes,
    load_wav,
    save_wav,
    wav_stream_header,
)
