"""Normalization + simulation-property (de)serialization utilities.

API-compatible with the reference's ``exciting_environments/utils.py``:
``MinMaxNormalization`` (``utils.py:8-17``) and the JSON round-trip helpers
``dump_sim_properties_to_json`` / ``load_sim_properties_from_json``
(``utils.py:21-53``) that the golden-file regression tests rely on.
"""

from __future__ import annotations

import json
from dataclasses import asdict

from exciting_environments_tpu.core.structures import pytree_dataclass


@pytree_dataclass
class MinMaxNormalization:
    """Min-max mapping between physical units and the normalized [-1, 1] band.

    ``min``/``max`` may be Python scalars or per-batch ``(batch_size,)`` arrays
    (heterogeneous-parameter batching, reference ``core_env.py:268-272``).
    """

    min: float
    max: float

    def normalize(self, denormalized_value):
        return 2 * (denormalized_value - self.min) / (self.max - self.min) - 1

    def denormalize(self, normalized_value):
        return (normalized_value + 1) / 2 * (self.max - self.min) + self.min


def dump_sim_properties_to_json(params, action_normalizations, physical_normalizations, tau, filename):
    """Persist (static params, normalizations, tau) as JSON for pinned fixtures."""
    data = {
        "params": params,
        "action_normalizations": {k: asdict(v) for k, v in action_normalizations.items()},
        "physical_normalizations": {k: asdict(v) for k, v in physical_normalizations.items()},
        "tau": tau,
    }
    with open(filename, "w") as f:
        json.dump(data, f, indent=4)


def load_sim_properties_from_json(filename):
    """Load (params, action_norms, physical_norms, tau) from a JSON fixture."""
    with open(filename, "r") as f:
        data = json.load(f)
    action_normalizations = {
        k: MinMaxNormalization(**v) for k, v in data["action_normalizations"].items()
    }
    physical_normalizations = {
        k: MinMaxNormalization(**v) for k, v in data["physical_normalizations"].items()
    }
    return data["params"], action_normalizations, physical_normalizations, data["tau"]
