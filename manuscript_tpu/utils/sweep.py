"""Lightweight hyperparameter search (the reference's Optuna-TPE workflow
without the optuna dependency — reference: src/example3_optuna.py:321-375).

Implements a quantile-based sampler in the TPE spirit: after a warmup of
uniform random trials, new candidates are drawn near the parameter values of
the top-quantile trials. Trials persist to a JSON study file so sweeps can
resume, mirroring Optuna's sqlite storage behavior.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Tuple, Union

import numpy as np

ParamSpec = Tuple  # ("float", lo, hi) | ("int", lo, hi) | ("cat", [choices])


class Study:
    def __init__(
        self,
        space: Dict[str, ParamSpec],
        storage: Optional[Union[str, Path]] = None,
        direction: str = "maximize",
        seed: int = 0,
        n_warmup: int = 10,
        top_quantile: float = 0.25,
    ):
        self.space = space
        self.direction = direction
        self.storage = Path(storage) if storage else None
        self.rng = np.random.default_rng(seed)
        self.n_warmup = n_warmup
        self.top_quantile = top_quantile
        self.trials: List[Dict[str, Any]] = []
        if self.storage and self.storage.exists():
            self.trials = json.loads(self.storage.read_text())["trials"]

    # -- sampling ----------------------------------------------------------

    def _sample_uniform(self) -> Dict[str, Any]:
        params = {}
        for name, spec in self.space.items():
            kind = spec[0]
            if kind == "float":
                params[name] = float(self.rng.uniform(spec[1], spec[2]))
            elif kind == "int":
                params[name] = int(self.rng.integers(spec[1], spec[2] + 1))
            elif kind == "cat":
                params[name] = spec[1][int(self.rng.integers(len(spec[1])))]
            else:
                raise ValueError(f"unknown spec {spec}")
        return params

    def _sample_guided(self) -> Dict[str, Any]:
        scores = np.array([t["value"] for t in self.trials], dtype=float)
        if self.direction == "minimize":
            scores = -scores
        k = max(1, int(len(scores) * self.top_quantile))
        top_idx = np.argsort(-scores)[:k]
        params = {}
        for name, spec in self.space.items():
            kind = spec[0]
            anchor_trial = self.trials[int(self.rng.choice(top_idx))]
            anchor = anchor_trial["params"][name]
            if kind == "float":
                lo, hi = spec[1], spec[2]
                sigma = (hi - lo) * 0.15
                params[name] = float(np.clip(self.rng.normal(anchor, sigma), lo, hi))
            elif kind == "int":
                lo, hi = spec[1], spec[2]
                sigma = max(1.0, (hi - lo) * 0.15)
                params[name] = int(np.clip(round(self.rng.normal(anchor, sigma)), lo, hi))
            else:
                # categorical: exploit anchor with 70% prob
                if self.rng.uniform() < 0.7:
                    params[name] = anchor
                else:
                    params[name] = spec[1][int(self.rng.integers(len(spec[1])))]
        return params

    def ask(self) -> Dict[str, Any]:
        if len(self.trials) < self.n_warmup:
            return self._sample_uniform()
        return self._sample_guided()

    def tell(self, params: Dict[str, Any], value: float) -> None:
        self.trials.append({"params": params, "value": float(value)})
        if self.storage:
            self.storage.parent.mkdir(parents=True, exist_ok=True)
            self.storage.write_text(
                json.dumps({"direction": self.direction, "trials": self.trials},
                           indent=1)
            )

    # -- driving -----------------------------------------------------------

    def optimize(self, objective: Callable[[Dict[str, Any]], float], n_trials: int):
        for _ in range(n_trials):
            params = self.ask()
            value = objective(params)
            self.tell(params, value)
        return self.best_trial

    @property
    def best_trial(self) -> Optional[Dict[str, Any]]:
        if not self.trials:
            return None
        key = (lambda t: t["value"]) if self.direction == "maximize" else (
            lambda t: -t["value"]
        )
        return max(self.trials, key=key)
