"""CLI entry point: train / render / eval dispatch.

Parity target: entry_point.py:21-44 (Hydra main: seed 42, logging setup,
mode dispatch to FieldConstructionPipeline) with the
configs/field_construction.yaml surface exposed as dotted overrides
(``key.subkey=value``), implemented with argparse + dataclass merging
(Hydra is not a baked dependency; the override grammar is preserved).

Usage:
  python -m langscenex_tpu.entry_point mode=train \\
      pipeline.data_path=demo/data/scene \\
      gaussian.opt.iterations=12000
"""
from __future__ import annotations

import argparse
import dataclasses
import logging
import random
import sys

import numpy as np


def setup_seed(seed: int = 42) -> None:
    """entry_point.setup_seed:14 (torch seeding replaced by numpy/python;
    JAX keys are threaded explicitly throughout)."""
    random.seed(seed)
    np.random.seed(seed)


def apply_overrides(obj, overrides: dict, prefix: str = "") -> None:
    """Apply dotted-path overrides onto nested dataclasses in place."""
    for key, val in overrides.items():
        parts = key.split(".")
        target = obj
        for p in parts[:-1]:
            target = getattr(target, p)
        leaf = parts[-1]
        cur = getattr(target, leaf)
        if isinstance(cur, bool):
            val = val.lower() in ("1", "true", "yes")
        elif isinstance(cur, int):
            val = int(val.replace("_", ""))
        elif isinstance(cur, float):
            val = float(val)
        setattr(target, leaf, val)


@dataclasses.dataclass
class RootConfig:
    mode: str = "train"
    seed: int = 42


def main(argv=None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    argv = argv if argv is not None else sys.argv[1:]
    if any(a in ("-h", "--help") for a in argv):
        print("usage: python -m langscenex_tpu.entry_point [key=value ...]\n"
              "  mode=train|render|eval   seed=42\n"
              "  pipeline.data_path=...   gaussian.opt.iterations=12000\n"
              "Dotted keys override the typed configs in utils/config.py\n"
              "(same override grammar as the reference's Hydra CLI).")
        return 0
    overrides = {}
    for arg in argv:
        if "=" not in arg:
            raise SystemExit(f"arguments must be key=value, got {arg!r}")
        k, v = arg.split("=", 1)
        overrides[k] = v

    mode = overrides.pop("mode", "train")
    seed = int(overrides.pop("seed", "42"))
    setup_seed(seed)

    from .pipeline import FieldConstructionPipeline, PipelinePaths
    from .utils.config import GaussianConfig

    paths = PipelinePaths(data_path=overrides.pop("pipeline.data_path", "."))
    for f in dataclasses.fields(PipelinePaths):
        key = f"pipeline.{f.name}"
        if key in overrides:
            val = overrides.pop(key)
            if isinstance(getattr(paths, f.name), bool):
                val = val.lower() in ("1", "true", "yes")
            setattr(paths, f.name, val)

    gcfg = GaussianConfig()
    gauss_overrides = {k[len("gaussian."):]: v for k, v in overrides.items()
                       if k.startswith("gaussian.")}
    apply_overrides(gcfg, gauss_overrides)
    unknown = [k for k in overrides if not k.startswith("gaussian.")]
    if unknown:
        raise SystemExit(f"unknown overrides: {unknown}")

    pipe = FieldConstructionPipeline(paths, gcfg)
    if mode == "train":
        pipe.preprocess()
        pipe.construct_field()
    elif mode == "render":
        pipe.render_result()
    elif mode == "eval":
        pipe.eval()
    else:
        raise SystemExit(f"unknown mode {mode!r} (train|render|eval)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
