"""Sketch kernels: pure numpy, Arrow-friendly, Spark-agnostic.

Every sketch satisfies the guava-probably ProbabilisticFilter-derived
contract (SURVEY.md §2): create / put / merge (putAll) / is_compatible /
to_bytes / from_bytes / error introspection; filters add might_contain and
(cuckoo only) remove.
"""

from dataclasses import dataclass, field

from .base import (
    FUNNEL_LONG,
    FUNNEL_NONE,
    FUNNEL_UTF8,
    IncompatibleSketchError,
    Sketch,
    hash_column,
)
from .bloom import BloomSketch, bloom_geometry
from .bottomk import BottomKSketch
from .cms import CmsSketch, cms_geometry
from .countsketch import CountSketch
from .cuckoo import CuckooSketch, cuckoo_geometry
from .dd import DDSketch
from .req import ReqSketch
from .hll import HllSketch
from .kll import KllSketch
from .mg import MisraGriesSketch
from .qf import QuotientFilterSketch, qf_geometry
from .fd import FrequentDirectionsSketch
from .sbf import ScalableBloomSketch
from .shll import SlidingHllSketch
from .theta import ThetaSketch
from .tdigest import TDigestSketch
from .tuplesketch import TupleSketch
from .varopt import VarOptSketch
from .xorf import XorFilter
from .xormap import XorStaticMap

_KINDS = {
    "bloom": BloomSketch,
    "cuckoo": CuckooSketch,
    "hll": HllSketch,
    "cms": CmsSketch,
    "kll": KllSketch,
    "tdigest": TDigestSketch,
    "mg": MisraGriesSketch,
    "theta": ThetaSketch,
    "fd": FrequentDirectionsSketch,
    "sbf": ScalableBloomSketch,
    "dd": DDSketch,
    "req": ReqSketch,
    "bottomk": BottomKSketch,
    "countsketch": CountSketch,
    "tuple": TupleSketch,
    "shll": SlidingHllSketch,
    "qf": QuotientFilterSketch,
    "xor": XorFilter,
    "varopt": VarOptSketch,
    "xormap": XorStaticMap,
}


@dataclass(frozen=True)
class SketchSpec:
    """Picklable sketch factory — what Spark closures capture.

    kind: bloom | cuckoo | hll | cms | kll | tdigest
    params: constructor kwargs (capacity/fpp, p, epsilon/delta, k, ...)
    """

    kind: str
    params: dict = field(default_factory=dict)

    def create(self) -> Sketch:
        cls = _KINDS.get(self.kind)
        if cls is None:
            raise ValueError(f"unknown sketch kind '{self.kind}' (have {sorted(_KINDS)})")
        return cls(**self.params)

    def __hash__(self):
        return hash((self.kind, tuple(sorted(self.params.items()))))

    def __eq__(self, other):
        return (
            isinstance(other, SketchSpec)
            and self.kind == other.kind
            and self.params == other.params
        )


__all__ = [
    "Sketch",
    "SketchSpec",
    "BloomSketch",
    "BottomKSketch",
    "ScalableBloomSketch",
    "CuckooSketch",
    "QuotientFilterSketch",
    "XorFilter",
    "VarOptSketch",
    "XorStaticMap",
    "HllSketch",
    "CmsSketch",
    "CountSketch",
    "KllSketch",
    "MisraGriesSketch",
    "ThetaSketch",
    "TDigestSketch",
    "TupleSketch",
    "SlidingHllSketch",
    "DDSketch",
    "IncompatibleSketchError",
    "bloom_geometry",
    "cuckoo_geometry",
    "qf_geometry",
    "cms_geometry",
    "hash_column",
    "FUNNEL_UTF8",
    "FUNNEL_LONG",
    "FUNNEL_NONE",
]
