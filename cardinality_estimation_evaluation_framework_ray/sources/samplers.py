"""Parameter samplers for randomized scenario sweeps.

Mirrors ``src/simulations/parameters_sampler.py:40-59``: a ParameterSampler
draws scenario kwargs from per-parameter sampler configs, so an evaluation
can sweep randomized scenario grids.  Driver-side helper (the sampled specs
parameterize distributed pipelines).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

from .datagen import TokensTableSpec


@dataclasses.dataclass(frozen=True)
class ParameterSamplerConfig:
    name: str
    sampler: Callable[[np.random.RandomState], object]


class ParameterSampler:
    """Callable drawing one kwargs dict per invocation."""

    def __init__(self, configs: list[ParameterSamplerConfig],
                 random_state: np.random.RandomState | None = None):
        self.configs = configs
        self.rs = random_state or np.random.RandomState()

    def __call__(self) -> dict:
        return {c.name: c.sampler(self.rs) for c in self.configs}


def uniform_int(lo: int, hi: int) -> Callable:
    return lambda rs: int(rs.randint(lo, hi + 1))


def uniform_choice(options: list) -> Callable:
    return lambda rs: options[rs.randint(len(options))]


def sample_scenarios(base: TokensTableSpec, sampler: ParameterSampler,
                     n: int) -> list[TokensTableSpec]:
    """Draw n scenario specs by overriding base fields with sampled kwargs."""
    return [dataclasses.replace(base, **sampler()) for _ in range(n)]
