"""Train CLI (reference scripts/train.py:1-31): config -> task class -> start().
"""

import argparse
import sys
from pathlib import Path

root_dir = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(root_dir))

from diffsinger_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()


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
    parser.add_argument("--infer", action="store_true",
                        help="test mode: run validation over the valid set only "
                             "(reference basics/base_task.py:442-464)")
    parser.add_argument("--profile", type=int, default=0, metavar="N",
                        help="capture an xprof trace of N training steps "
                             "(after warmup) into <work_dir>/profile")
    parser.add_argument("--ckpt_root", type=str, default="",
                        help="checkpoints root directory (default: <repo>/checkpoints)")
    args = parser.parse_args()

    from diffsinger_tpu.config import load_config
    from diffsinger_tpu.parallel.dist import maybe_initialize_distributed

    hp = load_config(
        args.config, exp_name=args.exp_name, hparams_str=args.hparams,
        reset=args.reset, infer=args.infer,
        ckpt_root=args.ckpt_root or (root_dir / "checkpoints"),
    )
    if args.profile:
        hp["profile_steps"] = args.profile
    # multi-host (pod / multi-node) runs: must precede any jax.devices() use;
    # replaces the reference's Lightning DDP node launch (configs/base.yaml:79-83)
    if maybe_initialize_distributed(hp):
        import jax

        print(f"| distributed: process {jax.process_index()}/{jax.process_count()}, "
              f"{len(jax.devices())} global devices")
    if args.infer:
        from diffsinger_tpu.training.train_state import build_optimizer
        from diffsinger_tpu.utils import load_class_from_name, remap_reference_class_name

        task_cls = load_class_from_name(remap_reference_class_name(hp["task_cls"]))
        task = task_cls(hp)
        tx, _ = build_optimizer(hp)
        state = task._init_or_resume(tx)
        _, valid_ds = task.build_datasets()
        task.run_validation(state, valid_ds)
        return
    run_task(hp, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
