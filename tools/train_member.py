"""Train ONE ensemble member of the tier-3 pair verifier with a given
MatchConfig.seed (the seed drives the misspelling draws in pair generation,
so members see different training distributions — the bagging axis).

    python tools/train_member.py --seed 101 --out /tmp/member101.pickle

66-dim reference feature family only (extra_features off): every ensemble
member must expect the same features as the committed artifact so the
matcher's family auto-detection keeps working on the combined model.
Owns its Ray session (library code never calls ray.init)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

EX = "/root/reference/example_dataset"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--rounds", type=int, default=1000)
    ap.add_argument("--patience", type=int, default=60)
    ap.add_argument("--num-cpus", type=int, default=16)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from doppel_speller_ray.cli import _TRUTH_MAPPING, _read_any
    from doppel_speller_ray.config import MatchConfig
    from doppel_speller_ray.pipelines.training import train_verifier

    cfg = MatchConfig(seed=args.seed)
    truth = _read_any(f"{EX}/example_truth.csv.gz", _TRUTH_MAPPING, "|")
    t0 = time.time()
    model, metrics = train_verifier(
        truth, cfg, model_path=args.out, extra_features=False,
        model_params={"n_rounds": args.rounds,
                      "early_stopping_rounds": args.patience})
    print(json.dumps({"seed": args.seed, "out": args.out,
                      "train_seconds": round(time.time() - t0, 1),
                      "n_trees": len(model.trees),
                      "metrics": metrics}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
