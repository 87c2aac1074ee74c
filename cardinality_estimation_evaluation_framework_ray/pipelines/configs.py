"""Named evaluation / estimator configs mirroring the reference's registry.

Mirrors ``src/evaluations/data/evaluation_configs.py``: the ``smoke_test``
evaluation (5 scenarios: independent, remarketing, fully-overlapping,
sequentially-correlated, subset — evaluation_configs.py:134-195) expressed as
TokensTableSpec overlays, and a name -> SketchEstimatorConfig registry
(evaluation_configs.py:1730-1762 shape) over this engine's sketches.
"""

from __future__ import annotations

from ..sources.datagen import TokensTableSpec
from ..state import (
    BloomSpec,
    CountMinSpec,
    ExactMultiSetSpec,
    FllSpec,
    HllSpec,
    KllSpec,
    LiquidLegionsSpec,
    SkaSpec,
    StratifiedSpec,
    TDigestSpec,
    VocSpec,
)
from ..state.bloom import FirstMomentEstimator
from ..state.ska import StandardizedHistogramEstimator
from ..state.voc import SequentialEstimator as VocSequentialEstimator
from .evaluator import EvaluationConfig, ScenarioConfig
from .simulator import MergingEstimator, SketchEstimatorConfig

import numpy as _np

_LN3 = float(_np.log(3))


def _make_surreal(epsilon: float):
    from ..state.noise import make_surreal_denoiser

    return make_surreal_denoiser(epsilon=epsilon)


def _make_geometric_estimate_noiser(epsilon: float, seed: int):
    from ..state.noise import geometric_noiser

    return geometric_noiser(epsilon, _np.random.RandomState(seed))


def smoke_test_scenarios(universe_size: int = 200_000, num_sources: int = 10,
                         rows_per_source: int = 400) -> list[ScenarioConfig]:
    base = dict(num_sources=num_sources, rows_per_source=rows_per_source,
                min_tok=16, max_tok=128, universe_size=universe_size, seed=42)
    return [
        ScenarioConfig("independent", TokensTableSpec(**base)),
        ScenarioConfig("remarketing",
                       TokensTableSpec(scenario="remarketing", **base)),
        ScenarioConfig("fully_overlapping",
                       TokensTableSpec(scenario="fully_overlapping",
                                       window_frac=0.25, **base)),
        ScenarioConfig("sequentially_correlated",
                       TokensTableSpec(scenario="sequential", shared_prop=0.5,
                                       window_frac=0.2, **base)),
        ScenarioConfig("subset",
                       TokensTableSpec(scenario="subset", window_frac=0.3, **base)),
    ]


def smoke_test_evaluation(num_runs: int = 3, **kwargs) -> EvaluationConfig:
    return EvaluationConfig(name="smoke_test", num_runs=num_runs,
                            scenarios=smoke_test_scenarios(**kwargs))


def reference_smoke_scenarios(universe_size: int = 200_000,
                              num_sets: int = 20,
                              tokens_per_row: int = 64) -> list[ScenarioConfig]:
    """The reference's OWN smoke_test scenario grid 1:1
    (evaluation_configs.py:134-195), over the faithful set generators
    (sources/set_generators.py) — exact overlap laws, not the statistical
    TokensTableSpec mirrors.  Reach rates mirror
    LARGE_REACH_RATE_SMOKE_TEST=0.2 / SMALL_REACH_RATE_SMOKE_TEST=0.1 /
    REMARKETING_RATE_VALUE=0.2 (evaluation_configs.py:48-70)."""
    from ..sources.set_generators import SetScenarioSpec

    set_size = int(universe_size * 0.2)
    seq_corr_set_size = int(universe_size * 0.1)
    mk = SetScenarioSpec.make
    kw = dict(tokens_per_row=tokens_per_row, seed=42)
    return [
        ScenarioConfig("independent", mk(
            "independent", universe_size=universe_size,
            set_sizes=[set_size] * num_sets, **kw)),
        ScenarioConfig("remarketing", mk(
            "independent", universe_size=int(universe_size * 0.2),
            set_sizes=[set_size] * num_sets, **kw)),
        ScenarioConfig("fully_overlapping", mk(
            "fully_overlapping", universe_size=universe_size,
            num_sets=num_sets, set_size=set_size, **kw)),
        ScenarioConfig("sequentially_correlated_all", mk(
            "sequentially_correlated", order="original", correlated_sets="all",
            shared_prop=0.5, set_sizes=[seq_corr_set_size] * num_sets, **kw)),
        ScenarioConfig("sequentially_correlated_one", mk(
            "sequentially_correlated", order="original", correlated_sets="one",
            shared_prop=0.5, set_sizes=[seq_corr_set_size] * num_sets, **kw)),
    ]


def reference_smoke_test_evaluation(num_runs: int = 3,
                                    **kwargs) -> EvaluationConfig:
    return EvaluationConfig(name="reference_smoke_test", num_runs=num_runs,
                            scenarios=reference_smoke_scenarios(**kwargs))


def bow_scenarios(universe_size: int = 200_000, num_sets: int = 10,
                  tokens_per_row: int = 64) -> list[ScenarioConfig]:
    """Scenario 3(a/b) of the full reference evaluation
    (evaluation_configs.py:307-353): exponential-bow heterogeneous reach,
    independent vs identical user-activity association."""
    from ..sources.set_generators import SetScenarioSpec

    set_size = int(universe_size * 0.2)
    mk = SetScenarioSpec.make
    kw = dict(tokens_per_row=tokens_per_row, seed=42)
    return [
        ScenarioConfig(f"exponential_bow-user_activity_association:{assoc}",
                       mk("exponential_bow", user_activity_association=assoc,
                          universe_size=universe_size,
                          set_sizes=[set_size] * num_sets, **kw))
        for assoc in ("independent", "identical")
    ]


def subset_scenarios(universe_size: int = 200_000, num_sets: int = 10,
                     tokens_per_row: int = 64) -> list[ScenarioConfig]:
    """Scenario 4(b) (evaluation_configs.py:395-441): fully-overlapping
    subsets, all three set orders."""
    from ..sources.set_generators import SetScenarioSpec

    large = int(universe_size * 0.2)
    small = int(universe_size * 0.02)
    mk = SetScenarioSpec.make
    return [
        ScenarioConfig(f"subset-order:{order}",
                       mk("subset", order=order, universe_size=universe_size,
                          num_large_sets=num_sets // 2,
                          num_small_sets=num_sets - num_sets // 2,
                          large_set_size=large, small_set_size=small,
                          tokens_per_row=tokens_per_row, seed=42))
        for order in ("original", "reversed", "random")
    ]


def frequency_smoke_scenarios(universe_size: int = 10**9,
                              num_sources: int = 5,
                              rows_per_source: int = 400) -> list[ScenarioConfig]:
    """Frequency scenarios (reference frequency_end_to_end shape,
    frequency_set_generator.py:82-341): controlled within-source repetition."""
    base = dict(num_sources=num_sources, rows_per_source=rows_per_source,
                min_tok=30, max_tok=30, universe_size=universe_size, seed=44)
    return [
        ScenarioConfig("freq_constant_2",
                       TokensTableSpec(frequency="constant:2", **base)),
        ScenarioConfig("freq_constant_5",
                       TokensTableSpec(frequency="constant:5", **base)),
        ScenarioConfig("freq_natural",
                       TokensTableSpec(**{**base, "universe_size": 5000,
                                          "min_tok": 16, "max_tok": 64})),
    ]


def frequency_smoke_evaluation(num_runs: int = 3, **kwargs) -> EvaluationConfig:
    return EvaluationConfig(name="frequency_smoke",
                            num_runs=num_runs,
                            scenarios=frequency_smoke_scenarios(**kwargs))


def get_evaluation_config(name: str, num_runs: int = 3,
                          **kwargs) -> EvaluationConfig:
    """Name -> EvaluationConfig registry (the reference's
    get_evaluation_config, evaluation_configs.py:796-813)."""
    builders = {
        "smoke_test": lambda: smoke_test_evaluation(num_runs=num_runs, **kwargs),
        "frequency_smoke": lambda: frequency_smoke_evaluation(
            num_runs=num_runs, **kwargs),
        "reference_smoke_test": lambda: reference_smoke_test_evaluation(
            num_runs=num_runs, **kwargs),
        "bow_sweep": lambda: EvaluationConfig(
            "bow_sweep", num_runs, bow_scenarios(**kwargs)),
        "subset_orders": lambda: EvaluationConfig(
            "subset_orders", num_runs, subset_scenarios(**kwargs)),
        "frequency_end_to_end": lambda: frequency_end_to_end_evaluation(
            num_runs=num_runs, **kwargs),
        "complete_test_with_selected_parameters": lambda:
            complete_test_with_selected_parameters(num_runs=num_runs, **kwargs),
        "complete_frequency_test_with_selected_parameters": lambda:
            complete_frequency_test_with_selected_parameters(
                num_runs=num_runs, **kwargs),
        "global_dp_stress_test": lambda:
            global_dp_stress_test(num_runs=num_runs, **kwargs),
    }
    if name not in builders:
        raise KeyError(f"unknown evaluation {name!r}; "
                       f"known: {sorted(builders)}")
    return builders[name]()


def set_size_list_choices(small_set_size: int, large_set_size: int,
                          num_sets: int) -> dict[str, list[int]]:
    """The reference's default set-size-list grid
    (_get_default_name_to_choices_of_set_size_list,
    evaluation_configs.py:240-258)."""
    return {
        "all_small": [small_set_size] * num_sets,
        "all_large": [large_set_size] * num_sets,
        "1st_small_then_large": (
            [small_set_size] + [large_set_size] * (num_sets - 1)),
        "1st_half_small_2nd_half_large": (
            [small_set_size] * int(num_sets / 2)
            + [large_set_size] * (num_sets - int(num_sets / 2))),
        "small_then_last_large": (
            [small_set_size] * (num_sets - 1) + [large_set_size]),
        "gradually_smaller": [
            int(large_set_size / _np.sqrt(i + 1)) for i in range(num_sets)],
    }


def complete_test_with_selected_parameters(
        num_runs: int = 3,
        universe_size: int = 1_000_000,
        num_sets: int = 20,
        order: str = "random",
        small_set_size_rate: float = 0.01,
        large_set_size_rate: float = 0.2,
        remarketing_rate: float = 0.2,
        shared_prop_list: tuple = (0.25, 0.5, 0.75),
        tokens_per_row: int = 64,
        seed: int = 42) -> EvaluationConfig:
    """The reference's complete_test_with_selected_parameters evaluation
    (evaluation_configs.py:670-737): scenarios 1/2 (independent,
    remarketing) x 6 set-size-list types, 3a/3b (exponential bow,
    independent/identical activity) x 6 types, 4a (fully overlapped,
    small/large), 4b (subset, 3 large/small splits), 5 (sequentially
    correlated, all/one x 6 types x shared_prop_list) — 65 scenarios over
    the faithful generators.  Defaults mirror the reference's constants
    (UNIVERSE_SIZE_VALUE=1e6, NUM_SETS_VALUE=20, rates 0.01/0.2,
    SHARED_PROP_LIST_VALUE=(0.25,0.5,0.75)); pass a smaller universe for
    sandbox-speed runs."""
    from ..sources.set_generators import SetScenarioSpec

    mk = SetScenarioSpec.make
    kw = dict(tokens_per_row=tokens_per_row, seed=seed)
    small = int(small_set_size_rate * universe_size)
    large = int(large_set_size_rate * universe_size)
    choices = set_size_list_choices(small, large, num_sets)
    scenarios: list[ScenarioConfig] = []

    # scenarios 1 & 2: independent / remarketing x set-size-list types
    for key_words, size in (("independent", universe_size),
                            (f"remarketing-remarketing_size:{int(universe_size * remarketing_rate)}",
                             int(universe_size * remarketing_rate))):
        for set_type, sizes in choices.items():
            scenarios.append(ScenarioConfig(
                f"{key_words}-universe_size:{universe_size}-small_set:{small}"
                f"-large_set:{large}-set_type:{set_type}",
                mk("independent", universe_size=size, set_sizes=sizes, **kw)))

    # scenario 3 (a/b): exponential bow x activity association x types
    for assoc in ("independent", "identical"):
        for set_type, sizes in choices.items():
            scenarios.append(ScenarioConfig(
                f"exponential_bow-user_activity_association:{assoc}"
                f"-universe_size:{universe_size}-small_set:{small}"
                f"-large_set:{large}-set_type:{set_type}",
                mk("exponential_bow", user_activity_association=assoc,
                   universe_size=universe_size, set_sizes=sizes, **kw)))

    # scenario 4a: fully overlapped, small / large
    for set_size in (small, large):
        scenarios.append(ScenarioConfig(
            f"fully_overlapped-universe_size:{universe_size}"
            f"-num_sets:{num_sets}-set_sizes:{set_size}",
            mk("fully_overlapping", universe_size=universe_size,
               num_sets=num_sets, set_size=set_size, **kw)))

    # scenario 4b: subset, three large/small splits
    for num_large in (1, int(num_sets / 2), num_sets - 1):
        scenarios.append(ScenarioConfig(
            f"subset-universe_size:{universe_size}-order:{order}"
            f"-num_large_sets:{num_large}-num_small_sets:{num_sets - num_large}"
            f"-large_set_size:{large}-small_set_size:{small}",
            mk("subset", order=order, universe_size=universe_size,
               num_large_sets=num_large, num_small_sets=num_sets - num_large,
               large_set_size=large, small_set_size=small, **kw)))

    # scenario 5: sequentially correlated, all/one x types x shared_prop
    for correlated in ("all", "one"):
        for set_type, sizes in choices.items():
            for sp in shared_prop_list:
                scenarios.append(ScenarioConfig(
                    f"sequentially_correlated_{correlated}-order:{order}"
                    f"-shared_prop:{sp}-set_type:{set_type}",
                    mk("sequentially_correlated", order=order,
                       correlated_sets=correlated, shared_prop=float(sp),
                       set_sizes=sizes, **kw)))

    return EvaluationConfig(name="complete_test_with_selected_parameters",
                            num_runs=num_runs, scenarios=scenarios)


def complete_frequency_test_with_selected_parameters(
        num_runs: int = 3,
        universe_size: int = 200_000,
        num_sets: int = 10,
        set_size: int | None = None,
        tokens_per_row: int = 64,
        seed: int = 44) -> EvaluationConfig:
    """The reference's complete_frequency_test_with_selected_parameters
    evaluation (evaluation_configs.py:634-667): frequency scenario 1
    (homogeneous shifted-Poisson, freq_rate x freq_cap grid, :514-551),
    scenario 2 (heterogeneous Gamma-Poisson, distribution_rate x freq_cap,
    :553-590) and scenario 3 (publisher-constant frequency, :593-631) — 28
    scenarios.  Defaults mirror FREQ_UNIVERSE_SIZE=200000,
    NUM_SETS_VALUE_FREQ=10, SET_SIZE_FOR_FREQ=20000."""
    from ..sources.set_generators import SetScenarioSpec

    if set_size is None:
        set_size = 20_000 if universe_size == 200_000 else universe_size // 10
    mk = SetScenarioSpec.make
    kw = dict(tokens_per_row=tokens_per_row, seed=seed)
    scenarios: list[ScenarioConfig] = []

    freq_rate_lists = [0.5, 1, 1.5, 2]
    freq_cap_lists = [3, 5, 10]
    for freq_rate, freq_cap in (
            (r, c) for r in freq_rate_lists for c in freq_cap_lists):
        scenarios.append(ScenarioConfig(
            f"homogeneous-universe_size:{universe_size}-num_sets:{num_sets}"
            f"-freq_rate:{freq_rate}-freq_cap:{freq_cap}",
            mk("homogeneous", universe_size=universe_size,
               set_sizes=[set_size] * num_sets,
               freq_rates=[float(freq_rate)] * num_sets,
               freq_cap=freq_cap, **kw)))

    for dist_rate, freq_cap in (
            (r, c) for r in freq_rate_lists for c in freq_cap_lists):
        scenarios.append(ScenarioConfig(
            f"heterogeneous-universe_size:{universe_size}-num_sets:{num_sets}"
            f"-distribution_rate:{dist_rate}-freq_cap:{freq_cap}",
            mk("heterogeneous", universe_size=universe_size,
               set_sizes=[set_size] * num_sets,
               gamma_params=[(1.0, float(dist_rate))] * num_sets,
               freq_cap=freq_cap, **kw)))

    for frequency in (2, 3, 5, 10):
        scenarios.append(ScenarioConfig(
            f"publisher_constant_frequency-universe_size:{universe_size}"
            f"-num_sets:{num_sets}-frequency:{frequency}",
            mk("publisher_constant_frequency", universe_size=universe_size,
               set_sizes=[set_size] * num_sets, frequency=frequency, **kw)))

    return EvaluationConfig(
        name="complete_frequency_test_with_selected_parameters",
        num_runs=num_runs, scenarios=scenarios)


def global_dp_stress_test(num_runs: int = 3,
                          reach_list: tuple = (1_000, 10_000, 100_000,
                                               1_000_000, 10_000_000),
                          tokens_per_row: int = 64,
                          seed: int = 45) -> EvaluationConfig:
    """The reference's cardinality global-DP stress test
    (evaluation_configs.py:738-755): one disjoint set per scenario at
    REACH_STRESS_TEST sizes (US_INTERNET_POPULATION-scale reach points)."""
    from ..sources.set_generators import SetScenarioSpec

    scenarios = [
        ScenarioConfig(
            f"{i}-reach:{reach}",
            SetScenarioSpec.make("disjoint", set_sizes=[int(reach)],
                                 tokens_per_row=tokens_per_row, seed=seed))
        for i, reach in enumerate(sorted(reach_list))
    ]
    return EvaluationConfig(name="global_dp_stress_test", num_runs=num_runs,
                            scenarios=scenarios)


def frequency_end_to_end_evaluation(num_runs: int = 3,
                                    universe_size: int = 200_000,
                                    num_sets: int = 10,
                                    tokens_per_row: int = 64) -> EvaluationConfig:
    """The reference's frequency_end_to_end evaluation shape
    (evaluation_configs.py:198-237 + 514-590): homogeneous shifted-Poisson,
    heterogeneous Gamma-Poisson, and publisher-constant frequency scenarios
    over the faithful multiset generators, reach rate 0.1."""
    from ..sources.set_generators import SetScenarioSpec

    set_size = int(universe_size * 0.1)
    mk = SetScenarioSpec.make
    kw = dict(tokens_per_row=tokens_per_row, seed=44)
    scenarios = [
        ScenarioConfig("homogeneous-freq_rate:1-freq_cap:5", mk(
            "homogeneous", universe_size=universe_size,
            set_sizes=[set_size] * num_sets, freq_rates=[1.0] * num_sets,
            freq_cap=5, **kw)),
        ScenarioConfig("homogeneous-freq_rate:3-freq_cap:10", mk(
            "homogeneous", universe_size=universe_size,
            set_sizes=[set_size] * num_sets, freq_rates=[3.0] * num_sets,
            freq_cap=10, **kw)),
        ScenarioConfig("heterogeneous-gamma:1_1-freq_cap:10", mk(
            "heterogeneous", universe_size=universe_size,
            set_sizes=[set_size] * num_sets,
            gamma_params=[(1.0, 1.0)] * num_sets, freq_cap=10, **kw)),
        ScenarioConfig("publisher_constant_frequency:3", mk(
            "publisher_constant_frequency", universe_size=universe_size,
            set_sizes=[set_size] * num_sets, frequency=3, **kw)),
    ]
    return EvaluationConfig(name="frequency_end_to_end", num_runs=num_runs,
                            scenarios=scenarios)


def get_frequency_estimator_configs(seed: int = 1) -> list[SketchEstimatorConfig]:
    """Frequency (k+ histogram) estimator registry entries, max_frequency=5."""
    return [
        SketchEstimatorConfig(name="exact-freq",
                              spec=ExactMultiSetSpec(), max_frequency=5),
        SketchEstimatorConfig(name="fll-p14-freq",
                              spec=FllSpec(p=14, seed=seed), max_frequency=5),
        SketchEstimatorConfig(
            name="same_key_aggregator-1e5_10-freq",
            spec=SkaSpec(length=100_000, decay_rate=10.0, seed=seed),
            estimator=StandardizedHistogramEstimator(max_freq=5),
            max_frequency=5),
    ]


class _BloomFirstMoment:
    def __init__(self, method: str, denoiser=None):
        self._est = FirstMomentEstimator(method, denoiser=denoiser)

    def __call__(self, sketch_list):
        return [self._est(sketch_list)]


class _BlipSketchNoiser:
    """Blip local-DP noise on a BloomSketch (the reference's ln3 variants)."""

    def __init__(self, epsilon: float, seed: int = 0):
        import numpy as np

        self._epsilon = epsilon
        self._rs = np.random.RandomState(seed)

    def __call__(self, sketch):
        from ..state.noise import blip

        out = sketch.spec.new()
        out.registers = blip(sketch.registers, self._epsilon,
                             sketch.spec.num_hashes, self._rs)
        return out


class _VocLaplaceNoiser:
    def __init__(self, epsilon: float, seed: int = 0):
        import numpy as np

        self._epsilon = epsilon
        self._rs = np.random.RandomState(seed)

    def __call__(self, sketch):
        from ..state.voc import laplace_noise_voc

        return laplace_noise_voc(sketch, self._epsilon, self._rs)


#: reference evaluation_configs.py:48-131 constants mirrored
ADBF_LENGTHS = {"1e4": 10_000, "1e5": 100_000, "2.5e5": 250_000, "1e6": 1_000_000}
VOC_LENGTHS = {"1024": 1024, "4096": 4096}
GEO_LENGTH_PROB_PRODUCT = 2  # geo probability = 2 / length
EXP_ADBF_DECAY_RATE = 10.0
UNIVERSE_SIZE_VALUE = 1_000_000


def _adbf_grid(seed: int) -> dict[str, SketchEstimatorConfig]:
    """The ADBF length x family x local-DP grid
    (evaluation_configs.py:1351-1371: adbf_config_constructors x
    ADBF_LENGTH_LIST x SKETCH_EPSILON_VALUES), plus global-DP estimate-noise
    variants of the exp family (1372-1390)."""
    out: dict[str, SketchEstimatorConfig] = {}
    fams = {
        "exp_bloom_filter": ("exp", "first_moment_exp",
                             lambda m: dict(distribution="exp",
                                            decay_rate=EXP_ADBF_DECAY_RATE)),
        "log_bloom_filter": ("log", "first_moment_log",
                             lambda m: dict(distribution="log")),
        "geo_bloom_filter": ("geo", "first_moment_geo",
                             lambda m: dict(distribution="geo",
                                            probability=GEO_LENGTH_PROB_PRODUCT / m)),
    }
    for fam, (method, est_tag, mk_kwargs) in fams.items():
        for ltag, length in ADBF_LENGTHS.items():
            cfg_tag = f"{ltag}_10" if fam == "exp_bloom_filter" else ltag
            spec = BloomSpec(length=length, seed=seed, **mk_kwargs(length))
            base = f"{fam}-{cfg_tag}"
            out[f"{base}-infty-{est_tag}"] = SketchEstimatorConfig(
                name=f"{base}-infty-{est_tag}", spec=spec,
                estimator=_BloomFirstMoment(method))
            out[f"{base}-ln3-{est_tag}"] = SketchEstimatorConfig(
                name=f"{base}-ln3-{est_tag}", spec=spec,
                sketch_noiser=_BlipSketchNoiser(epsilon=_LN3, seed=seed + 1),
                estimator=_BloomFirstMoment(
                    method, denoiser=_make_surreal(epsilon=_LN3)))
    # global-DP estimate noise on the exp family (geometric + gaussian)
    from ..state.noise import gaussian_noiser, geometric_noiser

    spec = BloomSpec(length=100_000, distribution="exp",
                     decay_rate=EXP_ADBF_DECAY_RATE, seed=seed)
    for noise_tag, mk_noiser in (
            ("geometric", lambda: geometric_noiser(
                _LN3, _np.random.RandomState(seed + 11))),
            ("gaussian", lambda: gaussian_noiser(
                _LN3, 1e-5, 1, _np.random.RandomState(seed + 12)))):
        name = f"exp_bloom_filter-1e5_10-infty-global_ln3_{noise_tag}-first_moment_exp"
        out[name] = SketchEstimatorConfig(
            name=name, spec=spec, estimator=_BloomFirstMoment("exp"),
            estimate_noiser=mk_noiser())
    return out


def _voc_grid(seed: int) -> dict[str, SketchEstimatorConfig]:
    """VoC length x local-DP grid (evaluation_configs.py:1393-1397)."""
    out: dict[str, SketchEstimatorConfig] = {}
    for ltag, length in VOC_LENGTHS.items():
        spec = VocSpec(num_buckets=length, seed=seed)
        out[f"vector_of_counts-{ltag}-infty-sequential"] = SketchEstimatorConfig(
            name=f"vector_of_counts-{ltag}-infty-sequential", spec=spec,
            estimator=VocSequentialEstimator(), dedup_input=True)
        out[f"vector_of_counts-{ltag}-ln3-sequential"] = SketchEstimatorConfig(
            name=f"vector_of_counts-{ltag}-ln3-sequential", spec=spec,
            sketch_noiser=_VocLaplaceNoiser(epsilon=_LN3, seed=seed + 2),
            estimator=VocSequentialEstimator(clip=True, epsilon=_LN3),
            dedup_input=True)
    return out


def _meta_voc_grid(seed: int) -> dict[str, SketchEstimatorConfig]:
    """Meta-VoC over exp-ADBF and over uniform BF
    (evaluation_configs.py:1409-1427 + meta_estimators.py:23-179)."""
    from ..state.composite import MetaVectorOfCountsEstimator

    out: dict[str, SketchEstimatorConfig] = {}
    for voc_tag, voc_len in VOC_LENGTHS.items():
        for adbf_tag in ("1e5", "2.5e5"):
            name = f"meta_voc-{voc_tag}-exp_bloom_filter-{adbf_tag}_10"
            out[name] = SketchEstimatorConfig(
                name=name,
                spec=BloomSpec(length=ADBF_LENGTHS[adbf_tag],
                               distribution="exp",
                               decay_rate=EXP_ADBF_DECAY_RATE, seed=seed),
                estimator=_ListWrap(MetaVectorOfCountsEstimator(
                    num_buckets=voc_len,
                    adbf_estimator=FirstMomentEstimator("exp"),
                    meta_seed=seed + 3)))
        name = f"meta_voc-{voc_tag}-bloom_filter-5e6"
        out[name] = SketchEstimatorConfig(
            name=name,
            spec=BloomSpec(length=5_000_000, distribution="uniform", seed=seed),
            estimator=_ListWrap(MetaVectorOfCountsEstimator(
                num_buckets=voc_len,
                adbf_estimator=FirstMomentEstimator("uniform"),
                meta_seed=seed + 3)))
    return out


class _ListWrap:
    """Adapt a scalar-returning estimator to the histogram contract."""

    def __init__(self, est):
        self._est = est

    def __call__(self, sketch_list):
        out = self._est(sketch_list)
        return out if isinstance(out, list) else [out]


def get_estimator_configs(names: list[str] | None = None,
                          seed: int = 1,
                          include_catalog: bool = True) -> list[SketchEstimatorConfig]:
    """Name -> config registry (the reference's estimator catalog shape).

    ``include_catalog=False`` restricts to the curated engine short names
    (the pre-catalog registry) — used by the interoperability sweep, which
    runs every returned config through the Simulator."""
    registry = {
        "hll-p14": SketchEstimatorConfig(
            name="hll-p14", spec=HllSpec(p=14, seed=seed)),
        "exact": SketchEstimatorConfig(
            name="exact", spec=ExactMultiSetSpec()),
        "exp_bloom_filter-1e5_10-first_moment_exp": SketchEstimatorConfig(
            name="exp_bloom_filter-1e5_10-first_moment_exp",
            spec=BloomSpec(length=100_000, distribution="exp", decay_rate=10.0,
                           seed=seed),
            estimator=_BloomFirstMoment("exp")),
        "log_bloom_filter-1e5-first_moment_log": SketchEstimatorConfig(
            name="log_bloom_filter-1e5-first_moment_log",
            spec=BloomSpec(length=100_000, distribution="log", seed=seed),
            estimator=_BloomFirstMoment("log")),
        "geo_bloom_filter-1e4_0.0012-first_moment_geo": SketchEstimatorConfig(
            name="geo_bloom_filter-1e4_0.0012-first_moment_geo",
            spec=BloomSpec(length=10_000, distribution="geo",
                           probability=0.0012, seed=seed),
            estimator=_BloomFirstMoment("geo")),
        "vector_of_counts-4096-sequential": SketchEstimatorConfig(
            name="vector_of_counts-4096-sequential",
            spec=VocSpec(num_buckets=4096, seed=seed),
            estimator=VocSequentialEstimator(),
            dedup_input=True),
        # local-DP ln3 variants (reference smoke-test ln3 rows,
        # evaluation_configs.py + bloom_filters.py:538-631)
        "exp_bloom_filter-1e5_10-ln3-first_moment_exp": SketchEstimatorConfig(
            name="exp_bloom_filter-1e5_10-ln3-first_moment_exp",
            spec=BloomSpec(length=100_000, distribution="exp", decay_rate=10.0,
                           seed=seed),
            sketch_noiser=_BlipSketchNoiser(epsilon=_LN3, seed=seed + 1),
            estimator=_BloomFirstMoment(
                "exp", denoiser=_make_surreal(epsilon=_LN3))),
        "vector_of_counts-4096-ln3-sequential": SketchEstimatorConfig(
            name="vector_of_counts-4096-ln3-sequential",
            spec=VocSpec(num_buckets=4096, seed=seed),
            sketch_noiser=_VocLaplaceNoiser(epsilon=_LN3, seed=seed + 2),
            estimator=VocSequentialEstimator(clip=True, epsilon=_LN3),
            dedup_input=True),
        "log_bloom_filter-1e5-ln3-first_moment_log": SketchEstimatorConfig(
            name="log_bloom_filter-1e5-ln3-first_moment_log",
            spec=BloomSpec(length=100_000, distribution="log", seed=seed),
            sketch_noiser=_BlipSketchNoiser(epsilon=_LN3, seed=seed + 3),
            estimator=_BloomFirstMoment(
                "log", denoiser=_make_surreal(epsilon=_LN3))),
        # global-DP variant: geometric (discrete Laplace) noise on the
        # ESTIMATE (estimator_noisers.py:44-64)
        "hll-p14-geometric_estimate_noise": SketchEstimatorConfig(
            name="hll-p14-geometric_estimate_noise",
            spec=HllSpec(p=14, seed=seed),
            estimate_noiser=_make_geometric_estimate_noiser(_LN3, seed + 4)),
        "fll-p14": SketchEstimatorConfig(
            name="fll-p14", spec=FllSpec(p=14, seed=seed), max_frequency=5),
        "liquid_legions-10_1e5": SketchEstimatorConfig(
            name="liquid_legions-10_1e5",
            spec=LiquidLegionsSpec(a=10.0, m=100_000, seed=seed)),
        "same_key_aggregator-1e5_10": SketchEstimatorConfig(
            name="same_key_aggregator-1e5_10",
            spec=SkaSpec(length=100_000, decay_rate=10.0, seed=seed),
            estimator=StandardizedHistogramEstimator(max_freq=5),
            max_frequency=5),
    }
    # --- generated grids (evaluation_configs.py:1351-1427 shape) ----------
    registry.update(_adbf_grid(seed))
    registry.update(_voc_grid(seed))
    registry.update(_meta_voc_grid(seed))

    from ..state.noise import geometric_noiser as _geo_noiser

    # SKA with global-DP noise split between reach and frequency histogram
    # (_exp_same_key_aggregator, evaluation_configs.py:1652-1684)
    for ltag in ("1e4", "1e5"):
        name = f"same_key_aggregator-{ltag}_10-global_ln3"
        registry[name] = SketchEstimatorConfig(
            name=name,
            spec=SkaSpec(length=ADBF_LENGTHS[ltag], decay_rate=10.0, seed=seed),
            estimator=StandardizedHistogramEstimator(
                max_freq=5,
                reach_noiser=_geo_noiser(_LN3 / 2,
                                         _np.random.RandomState(seed + 21)),
                frequency_noiser=_geo_noiser(_LN3 / 2,
                                             _np.random.RandomState(seed + 22))),
            max_frequency=5)

    # counting exp-ADBF: SumFunction registers over a non-uniform
    # distribution (AnySketch free composition, any_sketch.py:287-348)
    registry["exp_counting_bloom_filter-1e5_10-first_moment_exp"] = (
        SketchEstimatorConfig(
            name="exp_counting_bloom_filter-1e5_10-first_moment_exp",
            spec=BloomSpec(length=100_000, distribution="exp",
                           decay_rate=EXP_ADBF_DECAY_RATE, counting=True,
                           seed=seed),
            estimator=_BloomFirstMoment("exp")))

    # independence-assumption union over VoC reach
    # (_independent_set_estimator, evaluation_configs.py:957-989)
    from ..state.composite import IndependentSetEstimator

    registry["reach_using_voc-4096-independent_estimator"] = (
        SketchEstimatorConfig(
            name="reach_using_voc-4096-independent_estimator",
            spec=VocSpec(num_buckets=4096, seed=seed),
            estimator=IndependentSetEstimator(
                _ListWrap(VocSequentialEstimator()),
                universe_size=UNIVERSE_SIZE_VALUE),
            dedup_input=True))

    # Ertl-2017 improved HLL estimator variant (strict accuracy upgrade)
    registry["hll-p14-ertl"] = SketchEstimatorConfig(
        name="hll-p14-ertl", spec=HllSpec(p=14, seed=seed, estimator="ertl"))

    # --- full reference-name catalog (catalog.py: name-for-name replica of
    # _generate_cardinality/_frequency_estimator_configs) -------------------
    if include_catalog:
        from .catalog import generate_full_catalog

        full = generate_full_catalog(max_frequency=5, seed=seed)
        full.update(registry)  # engine short names win on collision
        registry = full
    if names is None:
        return list(registry.values())
    return [registry[n] for n in names]
