"""Codec registry — Spark-side ``CODECFactory`` analogue
(``headers/codecfactory.h:100-128``): name ↔ id ↔ class, per dtype."""

from __future__ import annotations

import numpy as np

from .base import IntCodec
from .baseline import EliasFanoCodec, VbyteCodec
from .delta_var import DeltaVarCodec
from .dict_ import DictCodec
from .intcodecs import DeltaCodec, ForCodec, LecoFixCodec, RawCodec, RleCodec
from .leco_lp import LecoLpCodec
from .leco_var import LecoVarCodec
from .leco_var_dp import LecoVarDpCodec
from .leco_var_lookahead import LecoVarLookaheadCodec
from .linked import LinkedCodec
from .outlier import LecoOutlierCodec
from .poly import Poly2Codec
from .poly_max import PolyMaxCodec
from .spline import SplineCodec

INT_CODEC_CLASSES: dict[str, type[IntCodec]] = {
    "raw": RawCodec,
    "for": ForCodec,
    "delta": DeltaCodec,
    "leco": LecoFixCodec,
    "rle": RleCodec,
    "dict": DictCodec,
    "leco_var": LecoVarCodec,
    "poly2": Poly2Codec,
    "delta_var": DeltaVarCodec,
    "leco_outlier": LecoOutlierCodec,
    "leco_var_dp": LecoVarDpCodec,
    "leco_var_lookahead": LecoVarLookaheadCodec,
    "linked": LinkedCodec,
    "spline": SplineCodec,
    "leco_lp": LecoLpCodec,
    "vbyte": VbyteCodec,
    "elias_fano": EliasFanoCodec,
    "poly_max": PolyMaxCodec,
}

# stable ids for embedding a codec choice inside payloads / chunk meta
# (append-only: ids are persisted inside chunk payloads)
CODEC_IDS: dict[str, int] = {name: i for i, name in enumerate(
    ["raw", "for", "delta", "leco", "rle", "dict", "fsst", "leco_var", "poly2",
     "delta_var", "leco_outlier", "leco_var_dp", "linked", "spline",
     "leco_var_lookahead", "leco_lp", "vbyte", "elias_fano", "poly_max"]
)}
CODEC_NAMES: dict[int, str] = {i: n for n, i in CODEC_IDS.items()}


def int_codec(name: str, dtype=np.uint64) -> IntCodec:
    return INT_CODEC_CLASSES[name](dtype)


def int_candidates(dtype=np.uint64, include_dict: bool = True) -> list[IntCodec]:
    """Candidate set for auto-selection (``experiments/best_compress.cpp:46-52``
    uses {piecewise_fix, nonlinear_fix, FOR, rle}; ours is the north-star set
    {leco, for, delta, rle, dict, raw})."""
    names = ["leco", "for", "delta", "rle", "raw"]
    if include_dict:
        names.append("dict")
    return [int_codec(n, dtype) for n in names]
