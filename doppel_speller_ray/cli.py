"""CLI entry points — the reference's five commands (``/root/reference/
doppelspeller/cli.py:14-132``) plus the dedup flagship, Ray-Data-style.

    python -m doppel_speller_ray.cli dedup --input pages.parquet --out clusters/
    python -m doppel_speller_ray.cli generate-predictions --truth t.csv --test q.csv --out pred.csv
    python -m doppel_speller_ray.cli closest-search-single-title --truth t.csv --title "Acme Inc"
    python -m doppel_speller_ray.cli train-model --truth t.csv --model-out model.pickle
    python -m doppel_speller_ray.cli get-predictions-accuracy --predictions p.parquet --actuals a.csv

The CLI owns the Ray session (guarded init); library code never does.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _ensure_ray(num_cpus: int | None = None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _read_any(path: str, mapping=None, delimiter: str = "|"):
    import ray.data as rd

    if path.endswith(".csv") or path.endswith(".csv.gz"):
        if mapping:
            from .sources.readers import read_mapped_csv

            return read_mapped_csv(path, mapping, delimiter)
        import pyarrow.csv as pacsv

        return rd.read_csv(path, parse_options=pacsv.ParseOptions(delimiter=delimiter))
    return rd.read_parquet(path)


_TRUTH_MAPPING = [("title_id", ("company_id", int)), ("title", ("name", str))]
_TEST_MAPPING = [("test_index", ("test_index", int)), ("title", ("name", str))]


def cmd_dedup(args) -> int:
    from .config import DedupConfig
    from .pipelines.dedup import dedup_pipeline, write_clusters

    _ensure_ray(args.num_cpus)
    cfg = DedupConfig(max_chars=None, checkpoint_dir=args.checkpoint_dir)
    ds = _read_any(args.input)
    id_col = "url" if "url" in ds.schema().names else "doc_id"
    t0 = time.perf_counter()
    res = dedup_pipeline(ds, cfg, id_col=id_col, text_col=args.text_col)
    write_clusters(res, args.out)
    print(json.dumps({"out": args.out, "seconds": round(time.perf_counter() - t0, 2),
                      **res.stats}))
    return 0


# tier-3 fixed accept-axis defaults — shared by the argparse definition
# and the --abstainer no-effect warning so they cannot drift
_DEFAULT_PREDICTION_THRESHOLD = 0.9
_DEFAULT_LEV_ACCEPT_FLOOR = 101


def cmd_generate_predictions(args) -> int:
    from .config import MatchConfig
    from .pipelines.matching import match_pipeline

    _ensure_ray(args.num_cpus)
    truth = _read_any(args.truth, _TRUTH_MAPPING, args.delimiter)
    test = _read_any(args.test, _TEST_MAPPING, args.delimiter)
    model = None
    if getattr(args, "model", None):
        # tier-3 verifier (reference predict.py:79-82 unpickles its booster
        # the same way); broadcast once, loaded per matcher actor
        from .stages.pair_model import BoostedPairModel

        model = BoostedPairModel.load(args.model)
    abstainer = None
    if getattr(args, "abstainer", None):
        import os
        import pickle

        if model is None:
            raise SystemExit("--abstainer requires --model: tier 3 never "
                             "runs without a pair verifier, so the "
                             "abstainer would silently influence nothing")
        with open(args.abstainer, "rb") as f:
            abstainer = pickle.load(f)
        # q is calibrated to ONE verifier's probability distribution: the
        # artifact must name its pair model (digest preferred — a renamed
        # or substituted file fails the content check, not just the name).
        expect = abstainer.get("pair_model")
        expect_sha = abstainer.get("pair_model_sha256")
        if not expect and not expect_sha:
            raise SystemExit(
                "--abstainer artifact carries no pair-model provenance "
                "(neither 'pair_model' nor 'pair_model_sha256'); refusing "
                "to run a possibly miscalibrated abstainer — retrain with "
                "tools/train_abstainer.py --artifact-out")
        if expect_sha:
            from .util import file_sha256

            got_sha = file_sha256(args.model)
            if got_sha != expect_sha:
                raise SystemExit(
                    f"--abstainer artifact was trained against pair-model "
                    f"sha256 {expect_sha[:12]}… but --model "
                    f"'{os.path.basename(args.model)}' hashes to "
                    f"{got_sha[:12]}…; q is calibrated to that verifier's "
                    "probability distribution")
        elif os.path.basename(args.model) != expect:
            raise SystemExit(
                f"--abstainer artifact was trained against '{expect}' but "
                f"--model is '{os.path.basename(args.model)}'; q is "
                "calibrated to that verifier's probability distribution")
        # the abstainer REPLACES the two fixed accept axes; explicit
        # non-default values would silently do nothing — say so
        if (args.prediction_threshold != _DEFAULT_PREDICTION_THRESHOLD
                or args.lev_accept_floor != _DEFAULT_LEV_ACCEPT_FLOOR):
            print("warning: --abstainer replaces --prediction-threshold/"
                  "--lev-accept-floor; the non-default value(s) passed "
                  "will have no effect", file=sys.stderr)
    cfg = MatchConfig(
        prediction_threshold=args.prediction_threshold,
        lev_accept_floor=args.lev_accept_floor)
    out = match_pipeline(test, truth, cfg, model=model, abstainer=abstainer)
    # reference output contract: (title_id, test_index) sorted, −1 not found
    # (predict.py:256-272)
    if args.out.endswith(".csv"):
        out.select_columns(["title_id", "test_index"]).write_csv(args.out + ".d")
        print(json.dumps({"out": args.out + ".d", "format": "csv"}))
    else:
        out.write_parquet(args.out, mode="overwrite")
        print(json.dumps({"out": args.out, "format": "parquet"}))
    return 0


def cmd_closest_search(args) -> int:
    from .config import MatchConfig
    from .pipelines.matching import match_single_title

    _ensure_ray(args.num_cpus)
    truth = _read_any(args.truth, _TRUTH_MAPPING, args.delimiter)
    got = match_single_title(args.title, truth, MatchConfig())
    print(json.dumps(got))
    return 0


def cmd_train_model(args) -> int:
    from .config import MatchConfig
    from .pipelines.training import train_verifier

    _ensure_ray(args.num_cpus)
    truth = _read_any(args.truth, _TRUTH_MAPPING, args.delimiter)
    _, metrics = train_verifier(truth, MatchConfig(), model_path=args.model_out)
    print(json.dumps({"model": args.model_out, **metrics}))
    return 0


def cmd_accuracy(args) -> int:
    from .config import MatchConfig
    from .pipelines.matching import accuracy_report

    _ensure_ray(args.num_cpus)
    preds = _read_any(args.predictions)
    actuals = _read_any(args.actuals,
                        [("test_index", ("test_index", int)),
                         ("title_id", ("company_id", int))], args.delimiter)
    print(json.dumps(accuracy_report(preds, actuals, MatchConfig())))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="doppel_speller_ray")
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dedup", parents=[common])
    d.add_argument("--input", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--text-col", default="text")
    d.add_argument("--checkpoint-dir", default=None)
    d.set_defaults(fn=cmd_dedup)

    g = sub.add_parser("generate-predictions", parents=[common])
    g.add_argument("--truth", required=True)
    g.add_argument("--test", required=True)
    g.add_argument("--out", required=True)
    g.add_argument("--delimiter", default="|")
    g.add_argument("--model", default=None,
                   help="optional pickled tier-3 verifier (train-model output)")
    # defaults mirror MatchConfig (imported lazily in the commands)
    g.add_argument("--prediction-threshold", type=float,
                   default=_DEFAULT_PREDICTION_THRESHOLD,
                   help="tier-3 accept bar on the verifier probability")
    g.add_argument("--lev-accept-floor", type=int,
                   default=_DEFAULT_LEV_ACCEPT_FLOOR,
                   help="hybrid accept: take a unique tier-3 argmax whose "
                        "gated Levenshtein ratio clears this floor even "
                        "when p fails the threshold (101 = off); the "
                        "ensemble artifact's swept point is 0.08/94")
    g.add_argument("--abstainer", default=None,
                   help="optional learned-abstainer artifact "
                        "(tools/train_abstainer.py); REPLACES the two "
                        "threshold axes with q(decision features) >= q_min "
                        "— with the ensemble pair model this dominates the "
                        "reference's published golden point")
    g.set_defaults(fn=cmd_generate_predictions)

    c = sub.add_parser("closest-search-single-title", parents=[common])
    c.add_argument("--truth", required=True)
    c.add_argument("--title", required=True)
    c.add_argument("--delimiter", default="|")
    c.set_defaults(fn=cmd_closest_search)

    t = sub.add_parser("train-model", parents=[common])
    t.add_argument("--truth", required=True)
    t.add_argument("--model-out", required=True)
    t.add_argument("--delimiter", default="|")
    t.set_defaults(fn=cmd_train_model)

    a = sub.add_parser("get-predictions-accuracy", parents=[common])
    a.add_argument("--predictions", required=True)
    a.add_argument("--actuals", required=True)
    a.add_argument("--delimiter", default="|")
    a.set_defaults(fn=cmd_accuracy)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    finally:
        import ray

        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
