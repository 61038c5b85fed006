"""Contamination-safe train/dev split for a growing corpus.

`split-dataset` (cli/data.py) splits the *current* sorted file set 80/20 —
faithful to utils/split_feature_dataset.py:9 — so growing the corpus
mid-training reshuffles which fileids are dev, and a pair trained on
earlier can silently become a held-out gate pair.  This tool instead
fixes the split over the FINAL corpus name universe (fileid_0..N-1) and
emits lists restricted to the features that exist right now: the
stage-1 lists are then guaranteed subsets of the final ones, so final
dev pairs are never trained on in any stage.

Usage:
  python tools/make_split.py work/dns/feats --out-dir work/dns/lists \
      --universe 8000 [--frac 0.8]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("feature_dir")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--universe", type=int, required=True,
                    help="final corpus size N: split is fixed over the "
                         "sorted names fileid_0..fileid_{N-1}")
    ap.add_argument("--frac", type=float, default=0.8)
    args = ap.parse_args(argv)

    universe = sorted(f"fileid_{i}.f32" for i in range(args.universe))
    n_train = int(len(universe) * args.frac)
    split = {name: ("train" if i < n_train else "dev")
             for i, name in enumerate(universe)}

    have = sorted(f for f in os.listdir(args.feature_dir)
                  if f.endswith(".f32") and f in split)
    os.makedirs(args.out_dir, exist_ok=True)
    for part in ("train", "dev"):
        files = [os.path.join(args.feature_dir, f) for f in have
                 if split[f] == part]
        path = os.path.join(args.out_dir, f"{part}_filelist.txt")
        with open(path, "w") as f:
            f.write("\n".join(files) + ("\n" if files else ""))
        print(f"{path}: {len(files)} files "
              f"(of {sum(1 for v in split.values() if v == part)} final)")


if __name__ == "__main__":
    main()
