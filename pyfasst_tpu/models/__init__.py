"""Model families: the FASST base class and its pre-wired variants.

Reference parity: pyfasst/audioModel.py (UNVERIFIED; mount empty, SURVEY.md).
Lazy attribute loading keeps `ops` <-> `models.components` import order acyclic
(the compute layer imports components without pulling in the host API).
"""

import importlib

from pyfasst_tpu.models.components import (  # noqa: F401
    FasstParams, SpatialComp, SpectralComp,
    INST, CONV, NMF, GMM, HMM,
)

_LAZY = {
    "FASST": "pyfasst_tpu.models.fasst",
    "MultiChanNMFInst_FASST": "pyfasst_tpu.models.variants",
    "MultiChanNMFConv": "pyfasst_tpu.models.variants",
    "MultiChanHMM": "pyfasst_tpu.models.variants",
    "multiChanSourceF0Filter": "pyfasst_tpu.models.variants",
    "DEMIX": "pyfasst_tpu.models.demix",
}

__all__ = [
    "FasstParams", "SpatialComp", "SpectralComp",
    "INST", "CONV", "NMF", "GMM", "HMM",
] + list(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module 'pyfasst_tpu.models' has no attribute {name!r}")
