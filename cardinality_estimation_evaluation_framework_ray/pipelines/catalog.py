"""Name-for-name replica of the reference's full estimator-config catalog.

Mirrors ``src/evaluations/data/evaluation_configs.py``'s generated registries:
``_generate_cardinality_estimator_configs`` (:1351-1427 — the ADBF length x
family x local-DP x global-DP grid, the global-DP budget-split and limit-test
grids, Vector-of-Counts, the independent estimator, HLL++, and both Meta-VoC
families) and ``_generate_frequency_estimator_configs`` (:1687-1727 — the
stratified VoC / exp-ADBF / geo-ADBF families, the exact multiset, and the
exponential same-key aggregator), with the exact name-construction scheme of
``construct_sketch_estimator_config_name`` (:893-955) so every name the
reference's catalog emits resolves here too.

Configs are built over this engine's sketch specs; only the *composition* is
mirrored, not the execution model (sketch builds run through the Ray Data
merge tree, estimators fold the few per-key final sketches driver-side).
"""

from __future__ import annotations

import itertools
import math
import zlib

import numpy as np

from ..state import (
    AdbfStratifiedOperator,
    BayesianApproximationSketchOperator,
    BloomSpec,
    ExactMultiSetSpec,
    ExpectationApproximationSketchOperator,
    HllSpec,
    LiquidLegionsSpec,
    CascadingLegionsSpec,
    SkaSpec,
    StratifiedSketchNoiser,
    StratifiedSpec,
    StratifiedSequentialEstimator,
    VocSketchOperator,
    VocSpec,
)
from ..state.bloom import FirstMomentEstimator
from ..state.composite import (
    IndependentSetEstimator,
    MetaVectorOfCountsEstimator,
)
from ..state.exact import LosslessEstimator
from ..state.legions import (
    CascadingLegionsEstimator,
    LiquidSequentialEstimator,
)
from ..state.noise import (
    gaussian_noiser,
    geometric_noiser,
    laplace_noiser,
    make_surreal_denoiser,
)
from ..state.ska import StandardizedHistogramEstimator
from ..state.voc import SequentialEstimator as VocSequentialEstimator
from .simulator import SketchEstimatorConfig

# ---------------------------------------------------------------------------
# constants (evaluation_configs.py:82-131)
# ---------------------------------------------------------------------------

LN3 = math.log(3)
NO_GLOBAL_DP_STR = "no_global_dp"
GLOBAL_DP_STR = "global_dp"
NO_LOCAL_DP_STR = "no_local_dp"
LOCAL_DP_STR = "local_dp"
GEOMETRIC_NOISE = "geometric_noise"
GAUSSIAN_NOISE = "gaussian_noise"

SKETCH_EPSILON_VALUES = (LN3, LN3 / 4, LN3 / 10, None)
ESTIMATE_EPSILON_VALUES = (LN3, None)
GLOBAL_DP_LIMIT_TEST_EPSILON_VALUES = [
    LN3 / x for x in [
        1, 2, 4, 10, 100, 200, 300, 400, 500, 600, 700, 800, 900, 1000,
        2000, 3000, 4000, 5000, 6000, 7000, 8000, 9000, 10000]
]
ESTIMATE_EPSILON_DELTA_VALUES = [
    (LN3, 1e-5), (LN3, 1e-6), (LN3, 1e-7), (None, None)]
NUM_ESTIMATE_QUERIES_VALUES = [
    1, 2, 4, 10, 100, 200, 300, 400, 500, 600, 700, 800, 900, 1_000, 2_000,
    3_000, 4_000, 5_000, 6_000, 7_000, 8_000, 9_000, 10_000, 50_000, 100_000,
    500_000, 1_000_000
]
EPSILON_DECIMALS = 4
EPSILON_DECIMALS_LIMIT_TEST = 8
DELTA_DECIMALS = 7
ADBF_LENGTH_LIST = [100_000, 250_000]
EXP_ADBF_DECAY_RATE = 10
STRATIFIED_EXP_ADBF_EPSILON_SPLIT = 0.5
SKETCH_OPERATOR_EXPECTATION = "expectation"
SKETCH_OPERATOR_BAYESIAN = "bayesian"
GEO_LENGTH_PROB_PRODUCT = 2
BLOOM_FILTERS_LENGTH_LIST = [5_000_000]
VOC_LENGTH_LIST = [1024, 4096]
UNIVERSE_SIZE_VALUE = 1_000_000


# ---------------------------------------------------------------------------
# name construction (evaluation_configs.py:816-955)
# ---------------------------------------------------------------------------

def format_epsilon(dp_type: str, epsilon: float | None = None,
                   decimals: int = EPSILON_DECIMALS) -> str:
    if epsilon is None:
        return NO_GLOBAL_DP_STR if dp_type == GLOBAL_DP_STR else NO_LOCAL_DP_STR
    return f"{dp_type}_{float(epsilon):0.{decimals}f}"


def format_privacy_parameters(dp_type: str, epsilon: float | None = None,
                              delta: float | None = None, num_queries: int = 1,
                              noise_type: str | None = None,
                              epsilon_decimals: int = EPSILON_DECIMALS,
                              delta_decimals: int = DELTA_DECIMALS) -> str:
    if epsilon is None:
        return NO_GLOBAL_DP_STR if dp_type == GLOBAL_DP_STR else NO_LOCAL_DP_STR
    epsilon_str = f"{epsilon:.{epsilon_decimals}f}"
    delta_str = f"{delta if delta is not None else 0:.{delta_decimals}f}"
    split_str = f"-budget_split-{num_queries}" if num_queries else ""
    noise_type_str = f"-{noise_type}" if noise_type else ""
    return f"{dp_type}_{epsilon_str},{delta_str}{noise_type_str}{split_str}"


def construct_name(sketch_name: str, sketch_config: str, estimator_name: str,
                   sketch_epsilon: float | None = None,
                   estimate_epsilon: float | None = None,
                   estimate_delta: float | None = None,
                   num_estimate_queries: int | None = None,
                   noise_type: str | None = None,
                   max_frequency: int | str | None = None,
                   epsilon_decimals: int = EPSILON_DECIMALS,
                   delta_decimals: int = DELTA_DECIMALS) -> str:
    for s in (sketch_name, sketch_config, estimator_name):
        assert "-" not in s, f'no dash allowed in name part: {s}'
    local = format_epsilon(LOCAL_DP_STR, sketch_epsilon, epsilon_decimals)
    if num_estimate_queries is None:
        glob = format_epsilon(GLOBAL_DP_STR, estimate_epsilon, epsilon_decimals)
    else:
        glob = format_privacy_parameters(
            GLOBAL_DP_STR, estimate_epsilon, estimate_delta,
            num_estimate_queries, noise_type, epsilon_decimals, delta_decimals)
    result = "-".join([sketch_name, sketch_config, estimator_name, local, glob])
    if max_frequency is not None:
        result += "-" + str(max_frequency)
    return result


def _seed_for(name: str, seed: int) -> int:
    """Deterministic per-config RNG seed derived from the name."""
    return (zlib.crc32(name.encode()) ^ (seed * 0x9E3779B1)) & 0x7FFFFFFF


# ---------------------------------------------------------------------------
# small adapters shared by the grids
# ---------------------------------------------------------------------------

class FirstMomentCard:
    """FirstMomentEstimator adapted to the 1-entry-histogram contract that
    both the simulator and the stratified estimators expect."""

    def __init__(self, method: str, denoiser=None, noiser=None):
        self._est = FirstMomentEstimator(method, denoiser=denoiser,
                                         noiser=noiser)

    def __call__(self, sketch_list) -> list[float]:
        out = self._est(sketch_list)
        return out if isinstance(out, list) else [out]


class ListWrap:
    """Adapt a scalar-returning estimator to the histogram contract."""

    def __init__(self, est):
        self._est = est

    def __call__(self, sketch_list):
        out = self._est(sketch_list)
        return out if isinstance(out, list) else [out]


class BlipSketchNoiser:
    """Blip local-DP on a BloomSketch (bloom_filters.py:538-570)."""

    def __init__(self, epsilon: float, seed: int = 0):
        self._epsilon = epsilon
        self._rs = np.random.RandomState(seed)

    def __call__(self, sketch):
        from ..state.noise import blip

        out = sketch.spec.new()
        out.registers = blip(sketch.registers, self._epsilon,
                             sketch.spec.num_hashes, self._rs)
        return out


class VocLaplaceNoiser:
    """Per-bucket Laplace on a VocSketch (vector_of_counts.py:140-163)."""

    def __init__(self, epsilon: float, seed: int = 0):
        self._epsilon = epsilon
        self._rs = np.random.RandomState(seed)

    def __call__(self, sketch):
        from ..state.voc import laplace_noise_voc

        return laplace_noise_voc(sketch, self._epsilon, self._rs)


class LegionFlipNoiser:
    """Register-flip noise on a (liquid|cascading) legions sketch
    (cascading_legions.py:95-107 / liquid_legions.py:124-141)."""

    def __init__(self, flip_probability: float, seed: int = 0):
        self._p = flip_probability
        self._rs = np.random.RandomState(seed)

    def __call__(self, sketch):
        out = sketch.spec.new()
        out.load_state(sketch.state_dict())
        out.added_noise = 0.0
        out.add_dp_noise(self._p, self._rs)
        return out


# ---------------------------------------------------------------------------
# cardinality estimator configs (evaluation_configs.py:1351-1427)
# ---------------------------------------------------------------------------

def _adbf_config(family: str, length: int, sketch_epsilon: float | None,
                 estimate_epsilon: float | None, seed: int,
                 estimate_delta: float | None = None,
                 num_estimate_queries: int | None = None,
                 noise_type: str | None = None,
                 epsilon_decimals: int = EPSILON_DECIMALS) -> SketchEstimatorConfig:
    """One ADBF config (the _log/_exp/_geo_bloom_filter_first_moment_*
    constructors, evaluation_configs.py:1020-1227)."""
    if family == "exp":
        sketch_name, cfg = "exp_bloom_filter", f"{length}_{EXP_ADBF_DECAY_RATE}"
        spec_kwargs = dict(distribution="exp",
                           decay_rate=float(EXP_ADBF_DECAY_RATE))
    elif family == "log":
        sketch_name, cfg = "log_bloom_filter", str(length)
        spec_kwargs = dict(distribution="log")
    elif family == "geo":
        probability = GEO_LENGTH_PROB_PRODUCT / length
        sketch_name, cfg = "geo_bloom_filter", f"{length}_{probability:.6f}"
        spec_kwargs = dict(distribution="geo", probability=probability)
    elif family == "uniform":
        sketch_name, cfg = "bloom_filter", f"{length}_hash1"
        spec_kwargs = dict(distribution="uniform")
    else:
        raise ValueError(family)

    est_name = ("union_estimator" if family == "uniform"
                else f"first_moment_{family}")
    name = construct_name(sketch_name, cfg, est_name,
                          sketch_epsilon=sketch_epsilon,
                          estimate_epsilon=estimate_epsilon,
                          estimate_delta=estimate_delta,
                          num_estimate_queries=num_estimate_queries,
                          noise_type=noise_type,
                          epsilon_decimals=epsilon_decimals)
    rng = _seed_for(name, seed)

    sketch_noiser = denoiser = None
    if sketch_epsilon:
        sketch_noiser = BlipSketchNoiser(sketch_epsilon, rng + 1)
        denoiser = make_surreal_denoiser(epsilon=sketch_epsilon)

    estimate_noiser = None
    if estimate_epsilon:
        if noise_type == GAUSSIAN_NOISE:
            estimate_noiser = gaussian_noiser(
                estimate_epsilon, estimate_delta or 1e-5,
                num_estimate_queries or 1, np.random.RandomState(rng + 2))
        else:  # geometric: budget split by dividing epsilon per query
            eps_per_query = estimate_epsilon / (num_estimate_queries or 1)
            estimate_noiser = geometric_noiser(
                eps_per_query, np.random.RandomState(rng + 2))

    return SketchEstimatorConfig(
        name=name,
        spec=BloomSpec(length=length, seed=seed, **spec_kwargs),
        estimator=FirstMomentCard(family, denoiser=denoiser,
                                  noiser=estimate_noiser),
        sketch_noiser=sketch_noiser)


def _voc_config(sketch_epsilon: float | None, estimate_epsilon: float | None,
                seed: int) -> SketchEstimatorConfig:
    """_vector_of_counts_4096_sequential (evaluation_configs.py:1241-1278)."""
    name = construct_name("vector_of_counts", "4096", "sequential",
                          sketch_epsilon=sketch_epsilon,
                          estimate_epsilon=estimate_epsilon)
    rng = _seed_for(name, seed)
    return SketchEstimatorConfig(
        name=name, spec=VocSpec(num_buckets=4096, seed=seed),
        estimator=VocSequentialEstimator(),
        sketch_noiser=(VocLaplaceNoiser(sketch_epsilon, rng + 1)
                       if sketch_epsilon else None),
        estimate_noiser=(laplace_noiser(estimate_epsilon,
                                        np.random.RandomState(rng + 2))
                         if estimate_epsilon else None),
        dedup_input=True)


def _independent_config(sketch_epsilon: float | None,
                        estimate_epsilon: float | None,
                        seed: int) -> SketchEstimatorConfig:
    """_independent_set_estimator (evaluation_configs.py:956-994): a
    1-bucket VoC reach sketch under the independence assumption."""
    name = construct_name(
        "reach_using_voc", "1",
        f"independent_estimator_universe{UNIVERSE_SIZE_VALUE}",
        sketch_epsilon=sketch_epsilon, estimate_epsilon=estimate_epsilon)
    rng = _seed_for(name, seed)
    return SketchEstimatorConfig(
        name=name, spec=VocSpec(num_buckets=1, seed=seed),
        estimator=IndependentSetEstimator(
            ListWrap(VocSequentialEstimator()), UNIVERSE_SIZE_VALUE),
        sketch_noiser=(VocLaplaceNoiser(sketch_epsilon, rng + 1)
                       if sketch_epsilon else None),
        estimate_noiser=(laplace_noiser(estimate_epsilon,
                                        np.random.RandomState(rng + 2))
                         if estimate_epsilon else None),
        dedup_input=True)


def _meta_voc_config(base: str, base_length: int, voc_length: int,
                     sketch_epsilon: float | None,
                     seed: int) -> SketchEstimatorConfig:
    """_meta_voc_for_exp_adbf / _meta_voc_for_bf
    (evaluation_configs.py:1281-1348)."""
    if base == "exp":
        sketch_name = "exp_bloom_filter"
        cfg = f"{base_length}_{EXP_ADBF_DECAY_RATE}"
        spec = BloomSpec(length=base_length, distribution="exp",
                         decay_rate=float(EXP_ADBF_DECAY_RATE), seed=seed)
        method = "exp"
    else:
        sketch_name, cfg = "bloom_filter", str(base_length)
        spec = BloomSpec(length=base_length, distribution="uniform", seed=seed)
        method = "uniform"
    name = construct_name(sketch_name, cfg, f"meta_voc_{voc_length}",
                          sketch_epsilon=sketch_epsilon)
    rng = _seed_for(name, seed)
    noiser = (VocLaplaceNoiser(sketch_epsilon, rng + 1)
              if sketch_epsilon else None)
    return SketchEstimatorConfig(
        name=name, spec=spec,
        estimator=ListWrap(MetaVectorOfCountsEstimator(
            num_buckets=voc_length,
            adbf_estimator=FirstMomentEstimator(method),
            meta_sketch_noiser=noiser, meta_seed=rng + 3)))


def generate_cardinality_estimator_configs(
        seed: int = 1) -> dict[str, SketchEstimatorConfig]:
    """The reference's full cardinality catalog, name for name
    (_generate_cardinality_estimator_configs, evaluation_configs.py:1351-1427),
    plus the uniform-BF constructor family (:1107-1148), the liquid-legions
    module constants (:1228-1239) and cascading-legions rows this engine also
    supports."""
    out: dict[str, SketchEstimatorConfig] = {}

    def put(cfg: SketchEstimatorConfig) -> None:
        out[cfg.name] = cfg

    # ADBF family x length x local DP x global DP
    for family in ("log", "exp", "geo"):
        for length in ADBF_LENGTH_LIST:
            for se in SKETCH_EPSILON_VALUES:
                for ee in ESTIMATE_EPSILON_VALUES:
                    put(_adbf_config(family, length, se, ee, seed))

    # global-DP budget-split grid (exp family)
    for length in ADBF_LENGTH_LIST:
        for ee, ed in ESTIMATE_EPSILON_DELTA_VALUES:
            for nq in NUM_ESTIMATE_QUERIES_VALUES:
                for noise_type in (GAUSSIAN_NOISE, GEOMETRIC_NOISE):
                    put(_adbf_config("exp", length, None, ee, seed,
                                     estimate_delta=ed,
                                     num_estimate_queries=nq,
                                     noise_type=noise_type))

    # global-DP limit test (exp family, 8-decimal epsilons)
    for length in ADBF_LENGTH_LIST:
        for ee in GLOBAL_DP_LIMIT_TEST_EPSILON_VALUES:
            put(_adbf_config("exp", length, None, ee, seed,
                             epsilon_decimals=EPSILON_DECIMALS_LIMIT_TEST))

    # Vector-of-Counts + independent estimator
    for se in SKETCH_EPSILON_VALUES:
        for ee in ESTIMATE_EPSILON_VALUES:
            put(_voc_config(se, ee, seed))
            put(_independent_config(se, ee, seed))

    # HLL++
    put(SketchEstimatorConfig(
        name=construct_name("hyper_log_log_plus", str(2 ** 14),
                            "hll_cardinality"),
        spec=HllSpec(p=14, seed=seed)))

    # Meta VoC over exp-ADBF and over uniform BF
    for voc_length in VOC_LENGTH_LIST:
        for base_length in ADBF_LENGTH_LIST:
            for se in SKETCH_EPSILON_VALUES:
                put(_meta_voc_config("exp", base_length, voc_length, se, seed))
        for bf_length in BLOOM_FILTERS_LENGTH_LIST:
            for se in SKETCH_EPSILON_VALUES:
                put(_meta_voc_config("bf", bf_length, voc_length, se, seed))

    # uniform BF first-moment (constructor :1107-1148; registered so the
    # family is runnable by name)
    for length in BLOOM_FILTERS_LENGTH_LIST:
        for se in SKETCH_EPSILON_VALUES:
            for ee in ESTIMATE_EPSILON_VALUES:
                put(_adbf_config("uniform", length, se, ee, seed))

    # liquid legions module constants (evaluation_configs.py:1228-1239);
    # ln3 local DP <-> flip probability 1/(1+e^ln3) = 0.25
    put(SketchEstimatorConfig(
        name="liquid_legions-1e5_10-infty-sequential",
        spec=LiquidLegionsSpec(a=10.0, m=10 ** 5, seed=seed),
        estimator=LiquidSequentialEstimator(
            np.random.RandomState(_seed_for("ll-seq", seed)))))
    put(SketchEstimatorConfig(
        name="liquid_legions-1e5_10-ln3-sequential",
        spec=LiquidLegionsSpec(a=10.0, m=10 ** 5, seed=seed),
        sketch_noiser=LegionFlipNoiser(0.25, _seed_for("ll-seq-ln3", seed)),
        estimator=LiquidSequentialEstimator(
            np.random.RandomState(_seed_for("ll-seq-ln3", seed) + 1))))

    # cascading legions (estimators/cascading_legions.py), same name scheme
    put(SketchEstimatorConfig(
        name="cascading_legions-32_10000-infty-estimator",
        spec=CascadingLegionsSpec(l=32, m=10_000, seed=seed),
        estimator=CascadingLegionsEstimator()))
    put(SketchEstimatorConfig(
        name="cascading_legions-32_10000-ln3-estimator",
        spec=CascadingLegionsSpec(l=32, m=10_000, seed=seed),
        sketch_noiser=LegionFlipNoiser(0.25, _seed_for("cl-ln3", seed)),
        estimator=CascadingLegionsEstimator(flip_probability=0.25)))

    return out


# ---------------------------------------------------------------------------
# frequency estimator configs (evaluation_configs.py:1430-1727)
# ---------------------------------------------------------------------------

def _stratified_voc_config(max_frequency: int, clip: bool, length: int,
                           sketch_epsilon: float | None,
                           seed: int) -> SketchEstimatorConfig:
    """_stratiefied_sketch_vector_of_counts (evaluation_configs.py:1430-1479):
    epsilon_split=0 — the 1+ stratum is the union-merge of the others and all
    strata carry the full local budget."""
    clip_str = "clip" if clip else "no_clip"
    name = construct_name("stratified_sketch_vector_of_counts", str(length),
                          f"sequential_{clip_str}",
                          sketch_epsilon=sketch_epsilon,
                          max_frequency=str(max_frequency))
    rng = _seed_for(name, seed)
    eps_float = sketch_epsilon if sketch_epsilon is not None else float("inf")
    operator = VocSketchOperator(clip=clip, epsilon=eps_float)
    sketch_noiser = None
    if sketch_epsilon:
        sketch_noiser = StratifiedSketchNoiser(
            lambda e, _r=rng: VocLaplaceNoiser(e, _r + 1),
            epsilon=sketch_epsilon, epsilon_split=0,
            one_plus_union=operator.union)
    return SketchEstimatorConfig(
        name=name,
        spec=StratifiedSpec(max_freq=max_frequency, cardinality_kind="voc",
                            cardinality_params=(("num_buckets", length),
                                                ("seed", seed)),
                            seed=seed),
        sketch_noiser=sketch_noiser,
        estimator=StratifiedSequentialEstimator(
            operator,
            VocSequentialEstimator(clip=clip, epsilon=eps_float)),
        max_frequency=max_frequency)


def _stratified_adbf_config(max_frequency: int, length: int,
                            sketch_epsilon: float | None,
                            global_epsilon: float | None,
                            method: str, operator_type: str,
                            seed: int) -> SketchEstimatorConfig:
    """_stratiefied_sketch_{geo,exponential}_adbf
    (evaluation_configs.py:1482-1636): epsilon_split=0.5 — half the local
    budget on the 1+ stratum (built from the underlying exact set), half on
    the frequency strata; the cardinality estimator denoises with the split
    epsilon and carries the global-DP geometric noise.

    Note: the locally-noised variants are noise-dominated by construction —
    the sketch operators run on RAW blipped registers and the surreal
    denoiser is applied only to the final merged stratum (exactly the
    reference's composition: the operator's internal FirstMomentEstimator
    has no denoiser, bloom_filter_sketch_operators.py:29-44, and
    evaluation_configs passes the denoiser only to the outer cardinality
    estimator, :1616-1624), so at ln3 the merged fill saturates and the
    estimates are intentionally extreme — these rows measure the DP cost."""
    if method == "exp":
        sketch_name = "stratified_sketch_exp_adbf"
        cfg = f"{length}_{EXP_ADBF_DECAY_RATE}"
        est_name = f"first_moment_estimator_exp_{operator_type}"
        spec_params = (("length", length), ("distribution", "exp"),
                       ("decay_rate", float(EXP_ADBF_DECAY_RATE)),
                       ("seed", seed))
        card_spec = BloomSpec(length=length, distribution="exp",
                              decay_rate=float(EXP_ADBF_DECAY_RATE), seed=seed)
    else:
        probability = GEO_LENGTH_PROB_PRODUCT / length
        sketch_name = "stratified_sketch_geo_adbf"
        cfg = f"{length}_{probability:.6f}"
        est_name = "first_moment_estimator_geo_expectation"
        spec_params = (("length", length), ("distribution", "geo"),
                       ("probability", probability), ("seed", seed))
        card_spec = BloomSpec(length=length, distribution="geo",
                              probability=probability, seed=seed)
    name = construct_name(sketch_name, cfg, est_name,
                          sketch_epsilon=sketch_epsilon,
                          estimate_epsilon=global_epsilon,
                          max_frequency=str(max_frequency))
    rng = _seed_for(name, seed)

    sketch_noiser = denoiser = None
    if sketch_epsilon:
        sketch_noiser = StratifiedSketchNoiser(
            lambda e, _r=rng: BlipSketchNoiser(e, _r + 1),
            epsilon=sketch_epsilon,
            epsilon_split=STRATIFIED_EXP_ADBF_EPSILON_SPLIT)
        denoiser = make_surreal_denoiser(
            epsilon=sketch_epsilon * STRATIFIED_EXP_ADBF_EPSILON_SPLIT)
    estimate_noiser = (geometric_noiser(global_epsilon,
                                        np.random.RandomState(rng + 2))
                       if global_epsilon is not None else None)

    if operator_type == SKETCH_OPERATOR_BAYESIAN:
        raw_op = BayesianApproximationSketchOperator(estimation_method=method)
    else:
        raw_op = ExpectationApproximationSketchOperator(
            estimation_method=method)
    return SketchEstimatorConfig(
        name=name,
        spec=StratifiedSpec(max_freq=max_frequency, cardinality_kind="bloom",
                            cardinality_params=spec_params, seed=seed),
        sketch_noiser=sketch_noiser,
        estimator=StratifiedSequentialEstimator(
            AdbfStratifiedOperator(raw_op, card_spec),
            FirstMomentCard(method, denoiser=denoiser,
                            noiser=estimate_noiser)),
        max_frequency=max_frequency)


def _ska_config(max_frequency: int, global_epsilon: float | None,
                length: int, seed: int) -> SketchEstimatorConfig:
    """_exp_same_key_aggregator (evaluation_configs.py:1652-1684): geometric
    global noise, budget split half reach / half frequency histogram."""
    name = construct_name("exp_same_key_aggregator",
                          f"{length}_{EXP_ADBF_DECAY_RATE}",
                          "standardized_histogram",
                          estimate_epsilon=global_epsilon,
                          max_frequency=str(max_frequency))
    rng = _seed_for(name, seed)
    reach_noiser = frequency_noiser = None
    if global_epsilon is not None:
        reach_noiser = geometric_noiser(global_epsilon / 2,
                                        np.random.RandomState(rng + 1))
        frequency_noiser = geometric_noiser(global_epsilon / 2,
                                            np.random.RandomState(rng + 2))
    return SketchEstimatorConfig(
        name=name,
        spec=SkaSpec(length=length, decay_rate=float(EXP_ADBF_DECAY_RATE),
                     seed=seed),
        estimator=StandardizedHistogramEstimator(
            max_freq=max_frequency, reach_noiser=reach_noiser,
            frequency_noiser=frequency_noiser),
        max_frequency=max_frequency)


def generate_frequency_estimator_configs(
        max_frequency: int = 5,
        seed: int = 1) -> dict[str, SketchEstimatorConfig]:
    """_generate_frequency_estimator_configs
    (evaluation_configs.py:1687-1727), name for name."""
    out: dict[str, SketchEstimatorConfig] = {}

    def put(cfg: SketchEstimatorConfig) -> None:
        out[cfg.name] = cfg

    for se, clip, length in itertools.product(SKETCH_EPSILON_VALUES,
                                              (False, True), VOC_LENGTH_LIST):
        put(_stratified_voc_config(max_frequency, clip, length, se, seed))

    for se, ge, length, op in itertools.product(
            SKETCH_EPSILON_VALUES, ESTIMATE_EPSILON_VALUES, ADBF_LENGTH_LIST,
            (SKETCH_OPERATOR_EXPECTATION, SKETCH_OPERATOR_BAYESIAN)):
        put(_stratified_adbf_config(max_frequency, length, se, ge, "exp", op,
                                    seed))

    for se, ge, length in itertools.product(
            SKETCH_EPSILON_VALUES, ESTIMATE_EPSILON_VALUES, ADBF_LENGTH_LIST):
        put(_stratified_adbf_config(max_frequency, length, se, ge, "geo",
                                    SKETCH_OPERATOR_EXPECTATION, seed))

    # exact multiset (evaluation_configs.py:1639-1649)
    put(SketchEstimatorConfig(
        name=construct_name("exact_multi_set", "10000", "lossless",
                            max_frequency=str(int(max_frequency))),
        spec=ExactMultiSetSpec(),
        estimator=LosslessEstimator(),
        max_frequency=max_frequency))

    for ge, length in itertools.product(ESTIMATE_EPSILON_VALUES,
                                        ADBF_LENGTH_LIST):
        put(_ska_config(max_frequency, ge, length, seed))

    return out


def generate_full_catalog(max_frequency: int = 5,
                          seed: int = 1) -> dict[str, SketchEstimatorConfig]:
    """Cardinality + frequency registries merged (the reference's
    get_estimator_configs lookup table, evaluation_configs.py:1730-1762)."""
    out = generate_cardinality_estimator_configs(seed)
    out.update(generate_frequency_estimator_configs(max_frequency, seed))
    return out
