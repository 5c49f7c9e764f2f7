"""Learned abstainer over tier-3 decision features.

Round-4 fifth-wave diagnosis (BASELINE.md): at threshold 0 the ensemble
argmax already finds 5,954 correct on the golden test — candidate recall is
not the limit — but ~19 true matches carry p < 0.01 while thousands of
no-match queries score higher, and neither a fixed p threshold, a lev
floor, nor a margin floor separates them (all three axes swept). This tool
trains the pinned next lever: q = P(argmax correct | decision features),
fit on the example TRAIN split (10k labeled rows the reference ships,
never touched by the pair-model training, which draws synthetic
misspellings from truth only), then applies the accept rule
``q >= q_min`` offline to a threshold-0 golden run.

Decision features come from ``match_pipeline(..., emit_features=True)``
(stages/matcher.py): model p / margin / second / mass, gated Levenshtein +
token-sort + deletion ratios of the argmax, tier-2 best ratio and tie
count, candidate count, IDF-Jaccard top/argmax/margin, query IDF mass,
argmax rank, query length. The abstainer itself reuses the repo's own
pure-numpy learners (LogisticPairModel / BoostedPairModel with the
β=5-weighted loss — the same asymmetry as the golden custom error).

Adopt-only-if-better rule (BASELINE.md): the artifact is committed only if
a swept point strictly dominates the reference's published (5,929, 633).

Usage: python tools/train_abstainer.py [--num-cpus 16] [--out sweep.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

EX = "/root/reference/example_dataset"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENSEMBLE = os.path.join(ROOT, "artifacts", "pair_model_ensemble5.pickle")

# single source of truth lives next to the matcher's hardcoded vector
sys.path.insert(0, ROOT)
from doppel_speller_ray.stages.matcher import (  # noqa: E402
    _ABSTAINER_FEATURES as FEATURES)


def feature_matrix(rows: list[dict]) -> np.ndarray:
    X = np.empty((len(rows), len(FEATURES)), dtype=np.float64)
    for j, f in enumerate(FEATURES):
        X[:, j] = [r[f] for r in rows]
    return X


def run_match(dataset_file: str, id_src: str, truth, cfg, model, num_cpus,
              top_k: int):
    from doppel_speller_ray.cli import _read_any
    from doppel_speller_ray.pipelines.matching import match_pipeline

    mapping = [("test_index", (id_src, int)), ("title", ("name", str))]
    ds = _read_any(f"{EX}/{dataset_file}", mapping, "|")
    preds = match_pipeline(ds, truth, cfg, model=model, model_top_k=top_k,
                           emit_features=True)
    return preds.take_all()


def golden_counts(rows: list[dict], act: dict[int, int], nf: int,
                  accept_model_row) -> dict:
    """Confusion counts under an arbitrary model-tier accept rule.

    ``accept_model_row(row) -> bool`` decides model-tier rows; exact/lev
    tiers always accept; not_found rows always emit nf — identical framing
    to tools/sweep_golden.sweep_counts."""
    pred = {}
    for r in rows:
        tid = r["title_id"]
        if r["tier"] == "model" and not accept_model_row(r):
            tid = nf
        pred[r["test_index"]] = tid
    correct = wrong = correct_nf = wrong_nf = 0
    for ti, a in act.items():
        p = pred.get(ti, nf)
        if a == nf:
            if p == nf:
                correct_nf += 1
            else:
                wrong += 1
        elif p == a:
            correct += 1
        elif p == nf:
            wrong_nf += 1
        else:
            wrong += 1
    return {"correctly_matched": correct, "incorrectly_matched": wrong,
            "correctly_not_found": correct_nf,
            "incorrectly_not_found": wrong_nf,
            "custom_error": wrong_nf + 5 * wrong}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-cpus", type=int, default=16)
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--model", default=ENSEMBLE)
    ap.add_argument("--out", default="/tmp/abstainer_sweep.json")
    ap.add_argument("--save-rows", default=None,
                    help="dump raw train/test feature rows for offline reuse")
    ap.add_argument("--rows", default=None,
                    help="reuse a --save-rows dump: refit + sweep with NO "
                         "Ray runs (feature/label data is fully cached; "
                         "pass the same --model the dump was made with so "
                         "the artifact provenance stays truthful)")
    ap.add_argument("--artifact-out", default=None,
                    help="write the runtime abstainer artifact (dict with "
                         "model/q_min/features/pair_model/model_top_k — "
                         "what match_pipeline(abstainer=...) and the CLI "
                         "--abstainer load) from the fitted GBDT learner")
    ap.add_argument("--q-min", type=float, default=0.05,
                    help="accept threshold stored in --artifact-out")
    args = ap.parse_args()

    sys.path.insert(0, ROOT)
    from doppel_speller_ray.config import MatchConfig
    from doppel_speller_ray.stages.pair_model import (
        BoostedPairModel, EnsemblePairModel, LogisticPairModel)

    cfg = MatchConfig(prediction_threshold=0.0)
    nf = cfg.not_found_value

    from doppel_speller_ray.util import file_sha256 as _model_sha

    if args.rows:
        with open(args.rows) as f:
            cached = json.load(f)
        train_rows, test_rows = cached["train"], cached["test"]
        train_act = {int(k): v for k, v in cached["train_act"].items()}
        test_act = {int(k): v for k, v in cached["test_act"].items()}
        # provenance comes FROM THE DUMP, not from this re-run's flags —
        # an artifact refit from a dump made with a different model/topk
        # must not be mislabeled (the runtime guards would then enforce
        # the wrong pairing). Error on an explicit mismatch.
        prov = cached.get("provenance")
        if prov:
            if os.path.basename(args.model) != prov["pair_model"]:
                raise SystemExit(
                    f"--rows dump was generated with pair model "
                    f"'{prov['pair_model']}' but --model is "
                    f"'{os.path.basename(args.model)}'; pass the matching "
                    "--model (or regenerate the dump)")
            if int(args.topk) != int(prov["model_top_k"]):
                raise SystemExit(
                    f"--rows dump was generated at model_top_k="
                    f"{prov['model_top_k']} but --topk is {args.topk}")
            pair_model_name = prov["pair_model"]
            pair_model_sha = prov.get("pair_model_sha256")
            artifact_topk = int(prov["model_top_k"])
            artifact_cfg_topk = prov.get("cfg_top_k")
        else:
            print("warning: legacy --rows dump without provenance; "
                  "trusting --model/--topk flags for artifact labeling",
                  file=sys.stderr)
            pair_model_name = os.path.basename(args.model)
            pair_model_sha = _model_sha(args.model) \
                if os.path.exists(args.model) else None
            artifact_topk = args.topk
            artifact_cfg_topk = cfg.top_k
    else:
        import ray

        if not ray.is_initialized():
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

        from doppel_speller_ray.cli import _TRUTH_MAPPING, _read_any

        model = EnsemblePairModel.load(args.model)
        truth = _read_any(f"{EX}/example_truth.csv.gz", _TRUTH_MAPPING, "|")

        # --- labeled runs: train split (fit) + golden test (evaluate) ----
        t0 = time.perf_counter()
        train_rows = run_match("example_train.csv.gz", "train_index", truth,
                               cfg, model, args.num_cpus, args.topk)
        t_train = time.perf_counter() - t0
        train_act = {r["test_index"]: r["title_id"] for r in _read_any(
            f"{EX}/example_train.csv.gz",
            [("test_index", ("train_index", int)),
             ("title_id", ("company_id", int))], "|").take_all()}

        t0 = time.perf_counter()
        test_rows = run_match("example_test.csv.gz", "test_index", truth,
                              cfg, model, args.num_cpus, args.topk)
        t_test = time.perf_counter() - t0
        test_act = {r["test_index"]: r["title_id"] for r in _read_any(
            f"{EX}/example_test_with_actuals.csv.gz",
            [("test_index", ("test_index", int)),
             ("title_id", ("company_id", int))], "|").take_all()}
        print(f"match runs: train {t_train:.0f}s test {t_test:.0f}s",
              file=sys.stderr)

        pair_model_name = os.path.basename(args.model)
        pair_model_sha = _model_sha(args.model)
        artifact_topk = args.topk
        artifact_cfg_topk = cfg.top_k

        if args.save_rows:
            with open(args.save_rows, "w") as f:
                json.dump({"train": train_rows, "test": test_rows,
                           "train_act": train_act, "test_act": test_act,
                           "provenance": {
                               "pair_model": pair_model_name,
                               "pair_model_sha256": pair_model_sha,
                               "model_top_k": args.topk,
                               "cfg_top_k": cfg.top_k}}, f)

    # --- abstainer training set: model-tier rows of the train split ------
    tr = [r for r in train_rows if r["tier"] == "model"]
    y = np.array([1.0 if r["title_id"] == train_act[r["test_index"]] else 0.0
                  for r in tr])
    X = feature_matrix(tr)
    print(f"train: {len(tr)} model-tier rows, {int(y.sum())} correct-argmax",
          file=sys.stderr)

    te = [r for r in test_rows if r["tier"] == "model"]
    Xte = feature_matrix(te)

    learners = {
        # β=5: the abstainer's false accept costs 5× a false abstain,
        # exactly the golden custom error's asymmetry
        "logistic": LogisticPairModel(beta=5.0, epochs=3000, seed=7),
        "gbdt": BoostedPairModel(beta=5.0, max_depth=4, n_rounds=400,
                                 eta=0.1, subsample=0.8, seed=7,
                                 early_stopping_rounds=30),
    }
    results = []
    for name, lrn in learners.items():
        if name == "gbdt":
            # held-out eval for early stopping: every 5th train_index
            # (modulo stratification, not a contiguous tail)
            h = np.array([r["test_index"] % 5 == 0 for r in tr])
            lrn.fit(X[~h], y[~h], eval_set=(X[h], y[h]))
        else:
            lrn.fit(X, y)
        q_te = lrn.predict_proba(Xte)
        q_by_idx = {r["test_index"]: float(q)
                    for r, q in zip(te, q_te)}
        for q_min in [0.02, 0.05, 0.08, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35,
                      0.4, 0.45, 0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8]:
            rep = golden_counts(
                test_rows, test_act, nf,
                lambda r: q_by_idx.get(r["test_index"], 0.0) >= q_min)
            rep.update({"learner": name, "q_min": q_min})
            results.append(rep)
            print(json.dumps(rep))

    if args.artifact_out:
        import pickle

        art = {"model": learners["gbdt"], "features": FEATURES,
               "q_min": args.q_min,
               "trained_on": "example_train model-tier rows "
                             "(80/20 hash split for early stop)",
               "pair_model": pair_model_name,
               "pair_model_sha256": pair_model_sha,
               "model_top_k": artifact_topk,
               "cfg_top_k": artifact_cfg_topk}
        with open(args.artifact_out, "wb") as f:
            pickle.dump(art, f)
        print(f"artifact written: {args.artifact_out}", file=sys.stderr)

    dom = [r for r in results if r["correctly_matched"] >= 5929
           and r["custom_error"] <= 633]
    best = min(dom or results, key=lambda r: (
        -(r["correctly_matched"] >= 5900), r["custom_error"]))
    print("DOMINATING" if dom else "BEST:", json.dumps(best))
    with open(args.out, "w") as f:
        json.dump({"sweep": results, "dominating": dom, "best": best,
                   "n_train_model_rows": len(tr),
                   "train_correct_argmax": int(y.sum())}, f, indent=1)
    if not args.rows:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    main()
