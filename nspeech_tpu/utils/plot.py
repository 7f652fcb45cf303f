"""Artifact plotting: alignments, spectrograms, waveforms -> PNG.

Same artifact set as the reference (reference: neural_speech/utils/plot.py)
implemented with bare matplotlib (librosa.display is not a dependency).
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np


def plot_alignment(alignment: np.ndarray, path: str, info: str | None = None) -> None:
    """alignment: [T_in, T_dec]."""
    fig, ax = plt.subplots()
    im = ax.imshow(np.asarray(alignment), aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)
    xlabel = "Decoder timestep"
    if info is not None:
        xlabel += "\n\n" + info
    plt.xlabel(xlabel)
    plt.ylabel("Encoder timestep")
    plt.tight_layout()
    plt.savefig(path, format="png")
    plt.close(fig)


def plot_specgram(spec: np.ndarray, path: str, spec_type: str = "linear") -> None:
    """spec: [T, F] normalized dB spectrogram (time-major)."""
    fig = plt.figure(figsize=(12, 8))
    plt.imshow(np.asarray(spec).T, aspect="auto", origin="lower",
               interpolation="none", cmap="magma")
    plt.colorbar(format="%+.2f")
    if spec_type == "linear":
        plt.title("Linear-frequency power spectrogram")
        plt.ylabel("Frequency bin")
    elif spec_type == "mel":
        plt.title("Mel spectrogram")
        plt.ylabel("Mel bin")
    plt.xlabel("Frame")
    plt.tight_layout()
    plt.savefig(path, format="png")
    plt.close(fig)


def plot_wave(wav: np.ndarray, sample_rate: int, path: str, text: str = "") -> None:
    fig = plt.figure(figsize=(16, 6))
    plt.title(text)
    t = np.arange(len(wav)) / sample_rate
    plt.plot(t, np.asarray(wav), linewidth=0.4)
    plt.xlabel("Time (s)")
    plt.tight_layout()
    plt.savefig(path, format="png")
    plt.close(fig)
