"""Layered YAML configuration.

Preserves the reference's config contract (same YAML files, same keys, same
merge order audio < train < model, same ``--hparams k=v,...`` CLI override
string; reference: neural_speech/hparams/__init__.py:8-26) while replacing
the ``tf.contrib.training.HParams`` global singleton with an explicit config
object that is passed to every consumer. The reference's DSP layer reads a
module-global (neural_speech/utils/audio.py:9,14); here nothing does.
"""

from __future__ import annotations

import ast
import os
from typing import Any, Dict

import yaml

_HPARAMS_DIR = os.path.join(os.path.dirname(__file__), "hparams")


class Config:
    """Attribute-accessible hyperparameter bag.

    Behaves like the reference HParams object: attribute read/write plus
    ``parse("k=v,...")`` overrides (reference: train.py:163). Unknown keys in
    ``parse`` raise, like HParams did.
    """

    def __init__(self, values: Dict[str, Any]):
        object.__setattr__(self, "_values", dict(values))

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name == "_values":  # not set yet (e.g. during unpickling)
            raise AttributeError(name)
        try:
            return self._values[name]
        except KeyError:
            raise AttributeError(f"Unknown hparam: {name!r}") from None

    def __setattr__(self, name: str, value: Any) -> None:
        self._values[name] = value

    # -- pickling (spawned preprocessing workers receive the config) --------
    def __getstate__(self) -> Dict[str, Any]:
        return {"_values": self._values}

    def __setstate__(self, state: Dict[str, Any]) -> None:
        object.__setattr__(self, "_values", state["_values"])

    def __contains__(self, name: str) -> bool:
        return name in self._values

    def get(self, name: str, default: Any = None) -> Any:
        return self._values.get(name, default)

    def values(self) -> Dict[str, Any]:
        return dict(self._values)

    def replace(self, **kwargs: Any) -> "Config":
        new = dict(self._values)
        new.update(kwargs)
        return Config(new)

    # -- CLI override string ------------------------------------------------
    def parse(self, override_string: str) -> "Config":
        """Apply ``k=v,...`` overrides in place (values parsed as Python
        literals when possible, strings otherwise)."""
        if not override_string:
            return self
        for item in override_string.split(","):
            item = item.strip()
            if not item:
                continue
            if "=" not in item:
                raise ValueError(f"Bad hparam override (need k=v): {item!r}")
            key, raw = item.split("=", 1)
            key = key.strip()
            if key not in self._values:
                raise ValueError(f"Unknown hparam in override: {key!r}")
            try:
                value = ast.literal_eval(raw)
            except (ValueError, SyntaxError):
                value = raw
            self._values[key] = value
        return self

    def __repr__(self) -> str:
        return f"Config({self._values!r})"


def _load_yaml(path: str) -> Dict[str, Any]:
    with open(path, "r", encoding="utf-8") as f:
        data = yaml.safe_load(f)
    return data or {}


def load_config(model_type: str, hparams_dir: str = _HPARAMS_DIR) -> Config:
    """Merge audio.yaml + train.yaml + <model_type>.yaml into a Config.

    Same merge order as the reference loader
    (neural_speech/hparams/__init__.py:14-22).
    """
    merged = _load_yaml(os.path.join(hparams_dir, "audio.yaml"))
    merged.update(_load_yaml(os.path.join(hparams_dir, "train.yaml")))
    merged.update(_load_yaml(os.path.join(hparams_dir, model_type + ".yaml")))
    return Config(merged)


# Back-compat alias matching the reference module function name.
load = load_config


def debug_string(cfg: Config) -> str:
    """Pretty-print, same format as reference debug_string
    (neural_speech/hparams/__init__.py:8-11)."""
    values = cfg.values()
    lines = ["  %s: %s" % (name, values[name]) for name in sorted(values)]
    return "Hyperparameters:\n" + "\n".join(lines)


# -- Derived audio/DSP parameters -------------------------------------------

def stft_params(cfg: Config) -> tuple[int, int, int]:
    """(n_fft, hop_length, win_length) derived exactly as the reference
    (neural_speech/utils/audio.py:126-130)."""
    n_fft = (cfg.num_freq - 1) * 2
    hop_length = int(cfg.frame_shift_ms / 1000 * cfg.sample_rate)
    win_length = int(cfg.frame_length_ms / 1000 * cfg.sample_rate)
    return n_fft, hop_length, win_length
