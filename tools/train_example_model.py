"""Train the tier-3 boosted pair verifier on the reference example dataset
and commit the artifact + metrics used by tests/test_golden_example.py.

    python tools/train_example_model.py

Owns its Ray session (library code never calls ray.init)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

EX = "/root/reference/example_dataset"
REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from doppel_speller_ray.cli import _TEST_MAPPING, _TRUTH_MAPPING, _read_any
    from doppel_speller_ray.config import MatchConfig
    from doppel_speller_ray.pipelines.matching import accuracy_report, match_pipeline
    from doppel_speller_ray.pipelines.training import train_verifier

    cfg = MatchConfig()
    # BASELINE.md rule: train to a scratch dir first (TRAIN_OUT_DIR), adopt
    # into artifacts/ only if the swept operating point improves
    art_dir = os.environ.get("TRAIN_OUT_DIR", os.path.join(REPO, "artifacts"))
    os.makedirs(art_dir, exist_ok=True)
    truth = _read_any(f"{EX}/example_truth.csv.gz", _TRUTH_MAPPING, "|")

    t0 = time.time()
    n_rounds = int(os.environ.get("TRAIN_ROUNDS", "600"))
    model, metrics = train_verifier(
        truth, cfg, model_path=os.path.join(art_dir, "pair_model_example.pickle"),
        model_params={"n_rounds": n_rounds, "early_stopping_rounds": 60})
    train_s = time.time() - t0

    test = _read_any(f"{EX}/example_test.csv.gz", _TEST_MAPPING, "|")
    actuals = _read_any(
        f"{EX}/example_test_with_actuals.csv.gz",
        [("test_index", ("test_index", int)), ("title_id", ("company_id", int))],
        "|")
    t0 = time.time()
    preds = match_pipeline(test, truth, cfg, model=model)
    rep = accuracy_report(preds, actuals, cfg)
    out = {
        "train_seconds": round(train_s, 1),
        "match_seconds": round(time.time() - t0, 1),
        "n_trees": len(model.trees),
        "best_iteration": model.best_iteration,
        "train_metrics": metrics,
        "golden_report": rep,
        "reference_golden": {"correctly_matched": 5929, "incorrectly_matched": 114,
                             "correctly_not_found": 3894, "incorrectly_not_found": 63,
                             "custom_error": 633},
    }
    with open(os.path.join(art_dir, "pair_model_example_metrics.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
