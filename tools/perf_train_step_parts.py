"""Decompose the production acoustic TRAIN STEP's device compute
(BASELINE config #5; companion to perf_train_parts.py, which decomposes the
host loop around it).

perf_train_parts.py measured the on-device step at 261 ms / 36.6% MFU for
18.8 TFLOP at B=64 x T=896.  This tool answers WHERE that device time goes by
AOT-compiling and timing sub-programs of the step on the same shapes:

  full          fwd + bwd + AdamW update (the deployed train step)
  grad          value_and_grad only (full minus the optimizer update)
  fwd           loss forward only
  denoise_fwd   one denoiser evaluation (LYNX 6x1024) alone
  denoise_grad  denoiser fwd+bwd alone (param grads of a scalar readout)
  encoder_fwd   FS2 encoder (encode method) alone
  aux_fwd       shallow-diffusion aux decoder (ConvNeXt 6x512) alone

Every program gets XLA cost-analysis FLOPs so per-part MFU is comparable.
Timings fetch a scalar per call (the axon tunnel's block_until_ready does not
force remote execution).  Writes docs/perf/train_step_parts.json.

Usage: python tools/perf_train_step_parts.py [--batch 64] [--frames 896]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import re
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s4": 1, "u4": 1,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "f32": 4, "s32": 4, "u32": 4,
    "f64": 8, "s64": 8, "u64": 8, "c64": 8, "c128": 16,
}
_SHAPE_RE = re.compile(r"(" + "|".join(_DTYPE_BYTES) + r")\[([0-9,]*)\]")


def _shape_bytes(type_str: str) -> int:
    """Total bytes of an HLO type string (tuples summed)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def hlo_byte_table(compiled, top_n: int = 25):
    """Approximate per-instruction HBM traffic of the compiled ENTRY graph.

    Post-optimization HLO is a sequence of fusions/convs/dots; each top-level
    instruction reads its operands from HBM once and writes its outputs once
    (fusion-internal values never materialize), so traffic(op) ~ sum(operand
    bytes) + output bytes. This is the same model XLA's own
    `bytes accessed` cost uses, but attributed per instruction so the top
    byte producers are visible. Parameters/constants/GTE/bitcast cost nothing.
    Caveat: covers the ENTRY computation (the train step has no top-level
    while/cond); a scan would need trip-count multiplication.
    """
    text = compiled.as_text()
    # find ENTRY computation body
    m = re.search(r"^ENTRY [^\n]*\{$", text, re.M)
    if not m:
        return None
    body = text[m.end(): text.index("\n}", m.end())]
    inst_re = re.compile(
        r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\([^=]*?\)|[\w\[\]{}:,#*\s]+?))\s+"
        r"([\w\-]+)\((.*)$", re.M)
    shapes: dict[str, str] = {}
    rows = []
    for mm in inst_re.finditer(body):
        name, type_str, opcode, rest = mm.groups()
        shapes[name] = type_str
        if opcode in ("parameter", "constant", "get-tuple-element", "bitcast",
                      "tuple", "after-all", "iota"):
            continue
        out_b = _shape_bytes(type_str)
        opnd_b = 0
        for op_name in re.findall(r"%?([\w.\-]+)", rest.split("),")[0]):
            if op_name in shapes:
                opnd_b += _shape_bytes(shapes[op_name])
        # categorize: fusion kind if present, else opcode
        kind = opcode
        km = re.search(r"kind=(\w+)", rest)
        if km:
            kind = f"fusion.{km.group(1)}"
        rows.append({"name": name, "op": kind, "bytes": out_b + opnd_b,
                     "out_bytes": out_b})
    rows.sort(key=lambda r: -r["bytes"])
    by_cat: dict[str, float] = {}
    for r in rows:
        by_cat[r["op"]] = by_cat.get(r["op"], 0) + r["bytes"]
    total = sum(r["bytes"] for r in rows)
    return {
        "total_gb": round(total / 1e9, 2),
        "by_category_gb": {k: round(v / 1e9, 3) for k, v in
                           sorted(by_cat.items(), key=lambda kv: -kv[1])},
        "top_instructions": [
            {**r, "gb": round(r["bytes"] / 1e9, 3)} for r in rows[:top_n]
        ],
        "n_instructions": len(rows),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=896)
    ap.add_argument("--tokens", type=int, default=112)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rng", type=str, default="rbg",  # production default
                    help="PRNG impl for the training rng stream "
                         "(rbg = XLA RngBitGenerator, the TPU-native fast path)")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated subset of programs to run")
    ap.add_argument("--hlo-bytes", action="store_true",
                    help="attribute per-instruction HBM traffic of each "
                         "program's optimized HLO (writes "
                         "docs/perf/train_step_bytes.json unless --only/--set)")
    ap.add_argument("--set", action="append", default=[], dest="overrides",
                    help="hparams override k=v (yaml-parsed; repeatable) for "
                         "A/B runs, e.g. --set recompute_grads=true")
    args = ap.parse_args()

    from diffsinger_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from diffsinger_tpu.config import load_config
    from diffsinger_tpu.models.toplevel import DiffSingerAcoustic
    from diffsinger_tpu.training.acoustic_task import make_acoustic_loss_fn
    from diffsinger_tpu.training.train_state import (
        build_optimizer, create_train_state, make_train_step,
    )

    hp = load_config(str(ROOT / "configs" / "acoustic.yaml"), save_snapshot=False)
    # match tools/tpu_train_bench.py's config: bf16 compute, no aug embeds
    hp.update(use_energy_embed=False, use_breathiness_embed=False,
              use_key_shift_embed=False, use_speed_embed=False,
              pl_trainer_precision="16-mixed")
    if args.overrides:
        import yaml

        for kv in args.overrides:
            k, v = kv.split("=", 1)
            tgt, parts = hp, k.split(".")
            for p in parts[:-1]:
                tgt = tgt[p]
            tgt[parts[-1]] = yaml.safe_load(v)
        print(f"| hparams overrides: {args.overrides}")
    n_mels = hp["audio_num_mel_bins"]

    model = DiffSingerAcoustic(hp, vocab_size=62, out_dims=n_mels, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    loss_fn = make_acoustic_loss_fn(model)
    tx, _ = build_optimizer(hp)
    state = create_train_state(params, tx)
    train_step = make_train_step(loss_fn, tx)

    B, T_MEL, T_TXT = args.batch, args.frames, args.tokens
    rng_np = np.random.default_rng(0)
    batch = {
        "tokens": jnp.asarray(rng_np.integers(1, 60, (B, T_TXT)).astype(np.int32)),
        "mel2ph": jnp.asarray(np.tile(
            np.repeat(np.arange(1, T_TXT + 1), T_MEL // T_TXT)[None], (B, 1)
        ).astype(np.int32)),
        "f0": jnp.asarray(np.full((B, T_MEL), 220.0, np.float32)),
        "mel": jnp.asarray(rng_np.normal(-6.0, 2.0, (B, T_MEL, n_mels)).astype(np.float32)),
    }
    key = jax.random.key(2, impl=args.rng)

    # sub-program inputs: cond from the encoder, a noisy x + t for the denoiser
    def encode(params, batch, rng):
        cond = model.module.apply(
            params, batch["tokens"], batch["mel2ph"], batch["f0"],
            deterministic=False, rngs={"dropout": rng}, method="encode")
        return jnp.abs(cond.astype(jnp.float32)).mean(), cond

    def make_cond():
        return jax.jit(lambda p, b, r: encode(p, b, r)[1])(params, batch, key)

    cond = make_cond()
    x = jnp.asarray(rng_np.normal(0, 1, (B, T_MEL, n_mels)).astype(np.float32))
    t_vec = jnp.asarray(np.full((B,), 500.0, np.float32))

    def denoise_fwd(params, x, t, cond):
        out = model.module.apply(params, x, t, cond, method="denoise")
        return jnp.abs(out.astype(jnp.float32)).mean()

    def denoise_grad(params, x, t, cond):
        g = jax.grad(denoise_fwd)(params, x, t, cond)
        return jax.tree_util.tree_reduce(
            lambda a, l: a + jnp.abs(l.astype(jnp.float32)).sum(), g, 0.0)

    def aux_fwd(params, cond, rng):
        out = model.module.apply(params, cond, infer=False, deterministic=False,
                                 rngs={"dropout": rng}, method="aux")
        return jnp.abs(out.astype(jnp.float32)).mean()

    # deterministic variants: the SAME math minus dropout mask generation —
    # the delta is the pure PRNG + mask-apply cost of each block
    def encode_nodrop(params, batch):
        cond = model.module.apply(
            params, batch["tokens"], batch["mel2ph"], batch["f0"],
            deterministic=True, method="encode")
        return jnp.abs(cond.astype(jnp.float32)).mean()

    def aux_nodrop(params, cond):
        out = model.module.apply(params, cond, infer=False, deterministic=True,
                                 method="aux")
        return jnp.abs(out.astype(jnp.float32)).mean()

    def fwd(params, batch, rng):
        loss, _ = loss_fn(params, batch, rng)
        return loss

    def grad(state, batch, rng):
        (loss, _), grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, rng), has_aux=True)(state.params)
        return loss + jax.tree_util.tree_reduce(
            lambda a, l: a + jnp.abs(l.astype(jnp.float32)).sum(), grads, 0.0)

    def full(state, batch, rng):
        new_state, metrics = train_step(state, batch, rng)
        return metrics["total_loss"], new_state

    programs = {
        "encoder_fwd": (lambda: jax.jit(lambda p, b, r: encode(p, b, r)[0])
                        .lower(params, batch, key).compile(),
                        lambda c, i: c(params, batch, jax.random.fold_in(key, i))),
        "encoder_nodrop": (lambda: jax.jit(encode_nodrop).lower(params, batch).compile(),
                           lambda c, i: c(params, batch)),
        "aux_fwd": (lambda: jax.jit(aux_fwd).lower(params, cond, key).compile(),
                    lambda c, i: c(params, cond, jax.random.fold_in(key, i))),
        "aux_nodrop": (lambda: jax.jit(aux_nodrop).lower(params, cond).compile(),
                       lambda c, i: c(params, cond)),
        "denoise_fwd": (lambda: jax.jit(denoise_fwd).lower(params, x, t_vec, cond).compile(),
                        lambda c, i: c(params, x, t_vec, cond)),
        "denoise_grad": (lambda: jax.jit(denoise_grad).lower(params, x, t_vec, cond).compile(),
                         lambda c, i: c(params, x, t_vec, cond)),
        "fwd": (lambda: jax.jit(fwd).lower(params, batch, key).compile(),
                lambda c, i: c(params, batch, jax.random.fold_in(key, i))),
        "grad": (lambda: jax.jit(grad).lower(state, batch, key).compile(),
                 lambda c, i: c(state, batch, jax.random.fold_in(key, i))),
        # donation matters: production jits with donate_argnums=0; an
        # undonated step pays param/opt-state copies (~17 ms at this scale).
        # The holder threads the returned state so each call donates the
        # previous one, exactly like the training loop.
        "full": (lambda: jax.jit(full, donate_argnums=0)
                 .lower(state, batch, key).compile(),
                 lambda c, i: _thread_full(c, i)),
    }
    _holder = {}

    def _thread_full(c, i):
        if "state" not in _holder:
            _holder["state"] = jax.device_put(state)
        loss, new_state = c(_holder["state"], batch, jax.random.fold_in(key, i))
        _holder["state"] = new_state
        return loss

    if args.only:
        keep = set(args.only.split(","))
        programs = {k: v for k, v in programs.items() if k in keep}

    peak = float(os.environ.get("DS_BENCH_PEAK_TFLOPS", "197")) * 1e12
    hbm_bw = float(os.environ.get("DS_BENCH_HBM_GBPS", "819")) * 1e9  # v5e
    result = {"device": jax.devices()[0].platform, "batch": B, "frames": T_MEL,
              "rng_impl": args.rng, "peak_tflops": peak / 1e12,
              "hbm_gbps": hbm_bw / 1e9, "parts": {}}
    byte_tables = {}
    for name, (build, call) in programs.items():
        t0 = time.time()
        compiled = build()
        compile_s = time.time() - t0
        if args.hlo_bytes:
            try:
                byte_tables[name] = hlo_byte_table(compiled)
            except Exception as e:  # parsing is best-effort diagnostics
                byte_tables[name] = {"error": repr(e)}
        flops = None
        bytes_accessed = None
        try:
            cost = compiled.cost_analysis()
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(cost.get("flops", 0.0)) or None
            bytes_accessed = float(cost.get("bytes accessed", 0.0)) or None
        except Exception:
            pass
        for i in range(2):  # warmup
            v = float(np.asarray(jax.device_get(call(compiled, 100 + i))).ravel()[0])
            assert np.isfinite(v), name
        times = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            float(np.asarray(jax.device_get(call(compiled, i))).ravel()[0])
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        # roofline floor: the program cannot run faster than its FLOPs at MXU
        # peak NOR its HBM traffic at peak bandwidth — whichever binds
        flop_floor_ms = (flops / peak * 1e3) if flops else None
        bw_floor_ms = (bytes_accessed / hbm_bw * 1e3) if bytes_accessed else None
        floor_ms = max(flop_floor_ms or 0.0, bw_floor_ms or 0.0) or None
        result["parts"][name] = {
            "ms": round(med * 1e3, 1),
            "flops": flops,
            "bytes_accessed": bytes_accessed,
            "mfu": round(flops / med / peak, 4) if flops else None,
            "floor_ms": round(floor_ms, 1) if floor_ms else None,
            "floor_bound": (None if not floor_ms else
                            ("hbm" if (bw_floor_ms or 0) > (flop_floor_ms or 0) else "mxu")),
            "achieved_vs_floor": round(floor_ms / (med * 1e3), 2) if floor_ms else None,
            "compile_s": round(compile_s, 1),
        }
        print(f"| {name:15s} {med*1e3:8.1f} ms  "
              f"{(flops or 0)/1e12:7.2f} TFLOP  "
              f"MFU {(flops / med / peak if flops else 0)*100:5.1f}%  "
              f"floor {floor_ms or 0:7.1f} ms "
              f"({result['parts'][name]['floor_bound'] or '-'}) "
              f"= {((floor_ms or 0) / (med*1e3))*100:4.0f}% of SoL", flush=True)

    if args.hlo_bytes:
        for name, table in byte_tables.items():
            if not table or "error" in table:
                print(f"| {name}: byte table unavailable: {table}")
                continue
            print(f"| {name}: HLO traffic {table['total_gb']} GB over "
                  f"{table['n_instructions']} instructions")
            for cat, gb in list(table["by_category_gb"].items())[:6]:
                print(f"|   {cat:24s} {gb:8.3f} GB")
            for r in table["top_instructions"][:8]:
                print(f"|   top: {r['op']:20s} {r['gb']:7.3f} GB  {r['name']}")
        if not args.overrides:
            outb = ROOT / "docs" / "perf" / "train_step_bytes.json"
            outb.write_text(json.dumps(
                {"device": result["device"], "batch": B, "frames": T_MEL,
                 "model": "traffic(op) = operand bytes + output bytes over "
                          "top-level optimized-HLO instructions",
                 "programs": byte_tables}, indent=2) + "\n")
            print(f"| wrote {outb}")

    if not args.only and not args.overrides:
        out = ROOT / "docs" / "perf" / "train_step_parts.json"
        out.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
