"""Vanilla-NeRF training CLI.

Usage (consumes the reference's nerf/yaml/* configs as-is):
    python -m nerf_projects_tpu.cli.train_nerf --config path/to/config.yaml
"""
from __future__ import annotations

import argparse

from nerf_projects_tpu.train.loop import train
from nerf_projects_tpu.utils.config import load_or_create_config


def main(argv=None):
    p = argparse.ArgumentParser(description="Train vanilla NeRF (TPU)")
    p.add_argument("--config", type=str, default=None, help="YAML config path")
    p.add_argument("--max_iters", type=int, default=None,
                   help="override N_iters (smoke runs)")
    args, overrides = p.parse_known_args(argv)
    cfg = load_or_create_config(args.config)
    # simple --key value overrides
    it = iter(overrides)
    for tok in it:
        if tok.startswith("--"):
            key = tok[2:]
            val = next(it, None)
            if key in cfg and val is not None:
                old = cfg[key]
                if isinstance(old, bool):
                    cfg[key] = val.lower() in ("1", "true", "yes")
                elif isinstance(old, int):
                    cfg[key] = int(val)
                elif isinstance(old, float):
                    cfg[key] = float(val)
                else:
                    cfg[key] = val
    train(cfg, max_iters=args.max_iters)


if __name__ == "__main__":
    main()
