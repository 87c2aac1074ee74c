from .base import (  # noqa: F401
    Sketch,
    SketchSpec,
    merge_many,
    register_spec,
    spec_from_dict,
)
from .bloom import (  # noqa: F401
    BayesianApproximationSketchOperator,
    BloomSketch,
    BloomSpec,
    ExpectationApproximationSketchOperator,
    FirstMomentEstimator,
    UnionEstimator,
    soft_union,
)
from .countmin import CountMinSketch, CountMinSpec  # noqa: F401
from .exact import ExactMultiSetSketch, ExactMultiSetSpec  # noqa: F401
from .hll import HllSketch, HllSpec  # noqa: F401
from .quantiles import KllSketch, KllSpec, TDigestSketch, TDigestSpec  # noqa: F401
from .voc import (  # noqa: F401
    PairwiseEstimator as VocPairwiseEstimator,
    SequentialEstimator as VocSequentialEstimator,
    VocSketch,
    VocSketchOperator,
    VocSpec,
    laplace_noise_voc,
)
