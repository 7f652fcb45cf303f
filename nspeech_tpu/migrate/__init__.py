"""Migration from the reference framework's on-disk artifacts.

``tfbundle``  — from-spec TensorFlow V2 checkpoint reader (no TF import).
``reference`` — reference-WaveNet variable-name mapping -> our params.

CLI entry point: ``import_reference_ckpt.py`` at the repo root converts a
``tf.train.Saver`` checkpoint into a servable nspeech_tpu run directory.
"""

from nspeech_tpu.migrate.tfbundle import BundleError, TFBundleReader
from nspeech_tpu.migrate.reference import (check_dilations, import_wavenet,
                                           ImportError_)

__all__ = ["BundleError", "TFBundleReader", "check_dilations",
           "import_wavenet", "ImportError_"]
