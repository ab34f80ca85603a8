"""Binarize CLI (reference scripts/binarize.py:15-24): config -> binarizer class
-> process().
"""

import argparse
import sys
from pathlib import Path

root_dir = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(root_dir))


def binarize(hp):
    from diffsinger_tpu.utils import load_class_from_name, remap_reference_class_name

    cls_name = remap_reference_class_name(hp["binarizer_cls"])
    binarizer_cls = load_class_from_name(cls_name)
    print("| Binarizer: ", binarizer_cls)
    binarizer_cls(hp).process()


def main():
    parser = argparse.ArgumentParser(description="binarize data")
    parser.add_argument("--config", type=str, required=True, help="training config file")
    parser.add_argument("--hparams", type=str, default="",
                        help="k=v,k2=v2 overrides (same syntax as train.py)")
    args = parser.parse_args()

    from diffsinger_tpu.config import load_config

    hp = load_config(args.config, hparams_str=args.hparams, save_snapshot=False)
    binarize(hp)


if __name__ == "__main__":
    main()
