"""Helper to import the reference implementation (CPU torch) for parity tests.

The reference lives read-only at /root/reference. Its features.py imports GPU
/audio packages not installed here (nnAudio, librosa); we stub them — only
CPU-safe code paths are exercised in tests.
"""

import sys
import types

_REF = "/root/reference"


def import_reference(name: str):
    for stub in ("nnAudio", "nnAudio.features", "librosa", "mir_eval",
                 "mir_eval.melody"):
        if stub not in sys.modules:
            mod = types.ModuleType(stub)
            sys.modules[stub] = mod
    sys.modules["nnAudio"].features = sys.modules["nnAudio.features"]
    sys.modules["mir_eval"].melody = sys.modules["mir_eval.melody"]
    if not hasattr(sys.modules["nnAudio.features"], "STFT"):
        sys.modules["nnAudio.features"].STFT = object
        sys.modules["nnAudio.features"].cqt = types.SimpleNamespace(CQT=object)
    if _REF not in sys.path:
        sys.path.append(_REF)
    return __import__(name)
