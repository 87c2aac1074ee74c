from .base import (  # noqa: F401
    Sketch,
    SketchSpec,
    merge_many,
    register_spec,
    spec_from_dict,
)
from .exact import ExactMultiSetSketch, ExactMultiSetSpec  # noqa: F401
from .hll import HllSketch, HllSpec  # noqa: F401
