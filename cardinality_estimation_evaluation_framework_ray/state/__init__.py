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
from .composite import (  # noqa: F401
    IndependentSetEstimator,
    MetaVectorOfCountsEstimator,
)
from .countmin import CountMinSketch, CountMinSpec  # noqa: F401
from .countsketch import CountSketch, CountSketchSpec  # noqa: F401
from .cuckoo import CuckooFilter, CuckooFilterSpec  # noqa: F401
from .ddsketch import DDSketch, DDSketchSpec  # noqa: F401
from .exact import (  # noqa: F401
    AddRandomElementsNoiser,
    ExactMultiSetSketch,
    ExactMultiSetSpec,
    LessOneEstimator,
    LosslessEstimator,
)
from .fll import FllSketch, FllSpec  # noqa: F401
from .heavyhitters import HeavyHittersSketch, HeavyHittersSpec  # noqa: F401
from .hll import HllSketch, HllSpec  # noqa: F401
from .legions import (  # noqa: F401
    CascadingLegionsEstimator,
    CascadingLegionsSketch,
    CascadingLegionsSpec,
    LiquidLegionsEstimator,
    LiquidLegionsSketch,
    LiquidLegionsSpec,
    LiquidSampler,
    LiquidSequentialEstimator,
    VennEstimator,
)
from .ska import SkaSketch, SkaSpec, StandardizedHistogramEstimator  # noqa: F401
from .stratified import (  # noqa: F401
    AdbfStratifiedOperator,
    ExactSetOperator,
    StratifiedSketch,
    StratifiedSketchNoiser,
    StratifiedSpec,
    PairwiseEstimator as StratifiedPairwiseEstimator,
    SequentialEstimator as StratifiedSequentialEstimator,
)
from .quantiles import KllSketch, KllSpec, TDigestSketch, TDigestSpec  # noqa: F401
from .theta import (  # noqa: F401
    ThetaSketch,
    ThetaSpec,
    theta_difference,
    theta_intersect,
)
from .voc import (  # noqa: F401
    PairwiseEstimator as VocPairwiseEstimator,
    SequentialEstimator as VocSequentialEstimator,
    VocSketch,
    VocSketchOperator,
    VocSpec,
    laplace_noise_voc,
)
