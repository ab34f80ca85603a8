"""Speaker-embedding surgery CLI (reference scripts/drop_spk.py:1-72):
edit rows of the spk_embed table in a checkpoint (zeros/random/mean/cyclic).
"""

import argparse
import sys
from pathlib import Path

import numpy as np

root_dir = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(root_dir))


def main():
    parser = argparse.ArgumentParser(description="edit speaker embedding rows of a checkpoint")
    parser.add_argument("ckpt", type=str, help="input checkpoint (.dsckpt)")
    parser.add_argument("output", type=str, help="output checkpoint path")
    parser.add_argument("--spk", type=int, nargs="+", required=True, help="speaker ids to edit")
    parser.add_argument("--mode", choices=["zeros", "random", "mean", "cyclic"], default="zeros")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from flax import serialization, traverse_util

    from diffsinger_tpu.utils.ckpt import load_checkpoint

    blob = load_checkpoint(args.ckpt)
    flat = traverse_util.flatten_dict(blob["params"], sep="/")
    emb_keys = [k for k in flat if k.endswith("spk_embed/embedding")]
    assert emb_keys, "no speaker embedding found in checkpoint"
    rng = np.random.default_rng(args.seed)
    for key in emb_keys:
        table = np.array(flat[key])
        n, h = table.shape
        others = [i for i in range(n) if i not in set(args.spk)]
        for j, spk in enumerate(args.spk):
            assert 0 <= spk < n, f"spk id {spk} out of range [0, {n})"
            if args.mode == "zeros":
                table[spk] = 0.0
            elif args.mode == "random":
                table[spk] = rng.standard_normal(h).astype(table.dtype) * (h ** -0.5)
            elif args.mode == "mean":
                table[spk] = table[others].mean(axis=0) if others else 0.0
            elif args.mode == "cyclic":
                table[spk] = table[others[j % len(others)]] if others else 0.0
        flat[key] = table
        print(f"| edited {key}: rows {args.spk} mode={args.mode}")

    blob["params"] = traverse_util.unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()})
    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(serialization.msgpack_serialize(blob))
    print(f"| saved: {out}")


if __name__ == "__main__":
    main()
