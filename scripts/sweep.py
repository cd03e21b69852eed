"""Hyperparameter-sweep launcher.

Rebuilds the reference's SLURM job-array mechanism (run_greatlake.sh:27-31
+ scheduleParams.txt: each array task picks one line of CLI params).
Works both ways:

  * under a scheduler: ``python scripts/sweep.py --params sweep.txt
    --index $SLURM_ARRAY_TASK_ID`` runs that one line;
  * standalone: omit --index to run every line sequentially.

Each line of the params file is argv for main_train, e.g.:
    --config configs/nuscenes_default.yaml
"""

import argparse
import os
import shlex
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", required=True,
                    help="file with one main_train argv per line")
    ap.add_argument("--index", type=int, default=None,
                    help="line to run (e.g. $SLURM_ARRAY_TASK_ID); "
                         "default: run all lines sequentially")
    args = ap.parse_args()

    with open(args.params) as f:
        lines = [l.strip() for l in f if l.strip()
                 and not l.startswith("#")]

    from tpu3dssf.cli.main_train import main as train_main
    todo = [lines[args.index]] if args.index is not None else lines
    for i, line in enumerate(todo):
        print(f"=== sweep job {args.index if args.index is not None else i}"
              f": {line}")
        train_main(shlex.split(line))


if __name__ == "__main__":
    main()
