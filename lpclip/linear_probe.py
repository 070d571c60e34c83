#!/usr/bin/env python
"""Linear probe on cached CLIP features (reference lpclip/linear_probe.py).

Protocol reproduced exactly: shots {16,8,4,2,1} x runs {1..3}; per-class
sampling without replacement; val shots capped {1:1,2:2,4:4,8:4,16:4};
coarse C grid {1e6..1e-6} on val, then an 8-step log-space binary refine
(reference :61-115); test accuracy of the final step reported mean (std) to
``report/<dataset>/...txt``.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from sklearn.linear_model import LogisticRegression

VAL_SHOTS = {1: 1, 2: 2, 4: 4, 8: 4, 16: 4}
COARSE_GRID = [1e6, 1e4, 1e2, 1, 1e-2, 1e-4, 1e-6]


def _l2_kwargs():
    """L2 regularization spelled per sklearn version: ``penalty="l2"`` is
    deprecated since 1.8 (removed in 1.10) in favor of ``l1_ratio=0``;
    both mean the same ridge term the reference's probe uses."""
    import sklearn

    major, minor = (int(x) for x in sklearn.__version__.split(".")[:2])
    if (major, minor) >= (1, 8):
        return {"l1_ratio": 0}
    return {"penalty": "l2"}


def fit_eval(c, xtr, ytr, xva, yva):
    clf = LogisticRegression(
        solver="lbfgs", max_iter=1000, C=c, **_l2_kwargs()
    ).fit(xtr, ytr)
    acc = float((clf.predict(xva) == yva).mean())
    return clf, acc


def sample_per_class(features, labels, k, rng):
    idx = []
    for label in np.unique(labels):
        pool = np.where(labels == label)[0]
        k_eff = min(k, len(pool))
        idx.extend(rng.choice(pool, size=k_eff, replace=False))
    return features[idx], labels[idx]


def refine_binary(
    c_left, c_right, xtr, ytr, xva, yva, xte, yte, num_step, log_fn
):
    """Log-space binary refine (reference :76-115): at each step evaluate the
    two endpoints on val, keep the better, halve the interval toward it."""
    test_accs = []
    for step in range(num_step):
        clf_left, acc_left = fit_eval(c_left, xtr, ytr, xva, yva)
        clf_right, acc_right = fit_eval(c_right, xtr, ytr, xva, yva)
        if acc_left < acc_right:
            c_final, clf_final = c_right, clf_right
            next_left = 0.5 * (np.log10(c_right) + np.log10(c_left))
            next_right = np.log10(c_right)
        else:
            c_final, clf_final = c_left, clf_left
            next_right = 0.5 * (np.log10(c_right) + np.log10(c_left))
            next_left = np.log10(c_left)
        test_acc = 100.0 * float((clf_final.predict(xte) == yte).mean())
        log_fn(step, c_final, test_acc)
        test_accs.append(test_acc)
        c_left, c_right = 10 ** next_left, 10 ** next_right
    return test_accs


def main(args) -> None:
    tv_path = os.path.join(args.feature_dir, args.trainval_dataset)
    te_path = os.path.join(args.feature_dir, args.test_dataset)

    train = np.load(os.path.join(tv_path, "train.npz"))
    val = np.load(os.path.join(tv_path, "val.npz"))
    test = np.load(os.path.join(te_path, "test.npz"))
    xtr_all, ytr_all = train["feature_list"], train["label_list"]
    xva_all, yva_all = val["feature_list"], val["label_list"]
    xte, yte = test["feature_list"], test["label_list"]

    report_dir = os.path.join(args.report_dir, args.test_dataset)
    os.makedirs(report_dir, exist_ok=True)
    tag = f"{os.path.basename(args.feature_dir.rstrip('/'))}_s{args.num_step}r{args.num_run}"

    for num_shot in [16, 8, 4, 2, 1]:
        final_accs = []
        for seed in range(1, args.num_run + 1):
            rng = np.random.RandomState(seed)
            xtr, ytr = sample_per_class(xtr_all, ytr_all, num_shot, rng)
            xva, yva = sample_per_class(
                xva_all, yva_all, VAL_SHOTS[num_shot], rng
            )

            accs = [fit_eval(c, xtr, ytr, xva, yva)[1] for c in COARSE_GRID]
            c_peak = COARSE_GRID[int(np.argmax(accs))]
            print(f"{args.test_dataset} {num_shot}-shot seed {seed}: "
                  f"coarse val accs {['%.3f' % a for a in accs]} peak C={c_peak}")

            def log_fn(step, c_final, test_acc, seed=seed, num_shot=num_shot):
                with open(os.path.join(report_dir, f"{tag}_details.txt"), "a+") as w:
                    w.write(
                        f"{args.test_dataset}, seed {seed}, {num_shot} shot, "
                        f"weight {c_final}, test_acc {test_acc:.2f}\n"
                    )

            step_accs = refine_binary(
                0.1 * c_peak, 10 * c_peak, xtr, ytr, xva, yva, xte, yte,
                args.num_step, log_fn,
            )
            final_accs.append(step_accs[-1])

        mean, std = np.mean(final_accs), np.std(final_accs)
        line = (
            f"{args.test_dataset}, {num_shot} Shot, "
            f"Test acc stat: {mean:.2f} ({std:.2f})\n"
        )
        print(line, flush=True)
        with open(os.path.join(report_dir, f"{tag}.txt"), "a+") as w:
            w.write(line)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--trainval_dataset", type=str, required=True)
    parser.add_argument("--test_dataset", type=str, required=True)
    parser.add_argument("--num_step", type=int, default=8)
    parser.add_argument("--num_run", type=int, default=3)
    parser.add_argument("--feature_dir", type=str, default="clip_feat")
    parser.add_argument("--report_dir", type=str, default="report")
    return parser.parse_args(argv)


if __name__ == "__main__":
    main(parse_args())
