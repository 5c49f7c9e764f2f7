"""Build a bagged EnsemblePairModel from trained member artifacts and sweep
its golden operating point on the reference's example dataset.

    python tools/eval_ensemble.py --members a.pickle b.pickle [c.pickle ...] \
        [--include-committed] [--out /tmp/ens/sweep.json] [--topk 10,20]

Members must share one feature family (EnsemblePairModel validates). The
sweep reuses tools/sweep_golden.py's offline threshold/lev-floor sweep; the
adopt-only-if-better rule from BASELINE.md applies — the committed artifact
changes ONLY if some swept point dominates the current committed point
(more correct AND lower custom error) or reaches the reference-dominance
target (correct ≥ 5,929 AND custom_error ≤ 633)."""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(ROOT, "artifacts", "pair_model_example.pickle")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--members", nargs="+", required=True)
    ap.add_argument("--include-committed", action="store_true")
    ap.add_argument("--ensemble-out", default="/tmp/ens/ensemble.pickle")
    ap.add_argument("--out", default="/tmp/ens/sweep.json")
    ap.add_argument("--topk", default="10,20")
    ap.add_argument("--num-cpus", type=int, default=16)
    args = ap.parse_args()

    sys.path.insert(0, ROOT)
    from doppel_speller_ray.stages.pair_model import (
        BoostedPairModel, EnsemblePairModel)

    paths = list(args.members)
    if args.include_committed:
        paths.insert(0, ART)
    members = [BoostedPairModel.load(p) for p in paths]
    # tolerate a member file that already holds an ensemble
    flat = []
    for m in members:
        flat.extend(getattr(m, "members", [m]))
    ens = EnsemblePairModel(flat)
    ens.save(args.ensemble_out)
    print(json.dumps({"n_members": len(flat), "paths": paths,
                      "ensemble": args.ensemble_out}))

    # one subprocess owns the Ray session (library code never ray.inits)
    rc = subprocess.call([sys.executable,
                          os.path.join(ROOT, "tools", "sweep_golden.py"),
                          "--model", args.ensemble_out,
                          "--topk", args.topk,
                          "--num-cpus", str(args.num_cpus),
                          "--out", args.out])
    if rc != 0:
        return rc
    rep = json.load(open(args.out))
    sweep = rep["sweep"] if isinstance(rep, dict) and "sweep" in rep else rep
    best_err = min(sweep, key=lambda r: r["custom_error"])
    dom = [r for r in sweep if r["correctly_matched"] >= 5929
           and r["custom_error"] <= 633]
    print(json.dumps({"best_error_point": best_err,
                      "dominating_points": dom[:5],
                      "n_dominating": len(dom)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
