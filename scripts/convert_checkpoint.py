"""Convert an Orbax checkpoint between unrolled and scanned layouts.

    python scripts/convert_checkpoint.py --in ckpt_unrolled \
        --out ckpt_scanned --to scan [--step N]

``--to scan`` restacks PTv3 ``{stage}_blk{i}`` subtrees into
``{stage}_scan`` stacks (and ViT ``block{i}`` into ``blocks``) so the
checkpoint loads under ``tpu_params.scan_blocks: true``; ``--to
unrolled`` is the inverse. Params and optimizer moments are both
converted (they mirror the param tree). See tpu3dssf/train/convert.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--in", dest="src", required=True,
                    help="source checkpoint directory")
    ap.add_argument("--out", dest="dst", required=True,
                    help="destination checkpoint directory")
    ap.add_argument("--to", choices=("scan", "unrolled"), required=True)
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default: latest)")
    args = ap.parse_args()

    import orbax.checkpoint as ocp
    from tpu3dssf.train.convert import convert_tree

    src = os.path.abspath(args.src)
    with ocp.CheckpointManager(src) as mngr:
        step = args.step if args.step is not None else mngr.latest_step()
        if step is None:
            raise SystemExit(f"no checkpoint found in {src}")
        # restore with the saved structure (no abstract target): orbax
        # returns nested dicts/lists of numpy arrays
        payload = mngr.restore(step)

    converted = convert_tree(payload, to_scan=(args.to == "scan"))

    from tpu3dssf.train.checkpoint import save_checkpoint
    state = converted.get("state", converted)
    extra = converted.get("extra")
    save_checkpoint(args.dst, step, state, extra)
    print(f"converted step {step}: {src} -> {os.path.abspath(args.dst)} "
          f"({args.to} layout)")


if __name__ == "__main__":
    main()
