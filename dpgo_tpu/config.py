"""YAML/JSON config loading for solver options.

The reference *declares* `load_yaml_file` but never implements it
(DPGO_utils.h:387-388 — a dead declaration with no definition anywhere in
the tree); here it actually works. Keys mirror the MMOptions / TNTParams
fields plus dataset/result paths.
"""

from __future__ import annotations

import dataclasses
import json
import os

from dpgo_tpu.solvers.mm import MMOptions
from dpgo_tpu.solvers.tnt import TNTParams


def load_config(path: str):
    """Load solver options from a .yaml/.yml/.json file.

    Returns (MMOptions, dict-of-extras). Unknown top-level keys are returned
    in extras (e.g. dataset, num_nodes, result_path).
    """
    with open(path) as fh:
        if path.endswith((".yaml", ".yml")):
            import yaml
            raw = yaml.safe_load(fh)
        else:
            raw = json.load(fh)
    raw = dict(raw or {})

    tnt_kwargs = {}
    tnt_fields = {f.name for f in dataclasses.fields(TNTParams)}
    for key in list(raw.keys()):
        if key in tnt_fields:
            tnt_kwargs[key] = raw.pop(key)
    tnt_raw = raw.pop("tnt", {}) or {}
    tnt_kwargs.update({k: v for k, v in tnt_raw.items()
                       if k in tnt_fields})

    mm_fields = {f.name for f in dataclasses.fields(MMOptions)}
    mm_kwargs = {k: raw.pop(k) for k in list(raw.keys()) if k in mm_fields}
    if tnt_kwargs:
        mm_kwargs["tnt"] = TNTParams(**tnt_kwargs)
    return MMOptions(**mm_kwargs), raw


def save_config(path: str, opts: MMOptions, **extras):
    data = dataclasses.asdict(opts)
    data.update(extras)
    with open(path, "w") as fh:
        if path.endswith((".yaml", ".yml")):
            import yaml
            yaml.safe_dump(data, fh)
        else:
            json.dump(data, fh, indent=2)
