"""Train CLI (reference scripts/train.py:1-31): config -> task class -> start().
"""

import argparse
import sys
from pathlib import Path

root_dir = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(root_dir))


def run_task(hp, max_steps=None):
    from diffsinger_tpu.utils import load_class_from_name, remap_reference_class_name

    cls_name = remap_reference_class_name(hp["task_cls"])
    task_cls = load_class_from_name(cls_name)
    print("| Task: ", task_cls)
    task = task_cls(hp)
    return task.start(max_steps=max_steps)


def main():
    parser = argparse.ArgumentParser(description="train a DiffSinger model")
    parser.add_argument("--config", type=str, default="", help="training config file")
    parser.add_argument("--exp_name", type=str, default="", help="experiment name")
    parser.add_argument("--hparams", type=str, default="", help="k=v,k2=v2 overrides")
    parser.add_argument("--reset", action="store_true", help="ignore saved work-dir config")
    parser.add_argument("--max_steps", type=int, default=None, help="override max_updates")
    args = parser.parse_args()

    from diffsinger_tpu.config import load_config

    hp = load_config(
        args.config, exp_name=args.exp_name, hparams_str=args.hparams,
        reset=args.reset, ckpt_root=root_dir / "checkpoints",
    )
    run_task(hp, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
